package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact money arithmetic on scaled longs.
  *
  * The data model ships money as doubles holding exact 2-decimal
  * values (prices) and exact hundredths (discount/tax rates) — checked
  * against the generator: zero rows off a cent grid across orders and
  * lineitem. `floor(x·100 + 0.5)` recovers the underlying integer
  * exactly (the double sits within 1e-11 of the true cent value, far
  * inside the 0.5 guard) and, unlike Spark's `round()`, stays inside
  * whole-stage codegen — `Round` on doubles routes through BigDecimal
  * per row (measured ~6 µs/row at sf10, 360 s of task time in one
  * aggregate).
  *
  * Long sums are exact and order-independent like the DECIMAL sums
  * they replace, at a fraction of the cost: Spark's decimal aggregate
  * updates measured ~10× a long update under ANSI mode (r12 probes at
  * sf10). Two grains:
  *
  *  - HIGH-cardinality keys (order / customer / supplier): a direct
  *    long sum. Overflow needs ~10⁹ fact rows under ONE key — orders
  *    of magnitude past the data model at any corpus size.
  *  - LOW-cardinality groups (nation pairs, return flags, global
  *    scalars): a single long CAN overflow at ~10¹⁰ fact rows per
  *    group (real at 100 TB). There the sum is two-level — the same
  *    salted-aggregate shape as q_salted_agg: long sums per
  *    (group, hash-bucket of a high-cardinality column), then a
  *    DECIMAL sum over the ≤BUCKETS per-bucket subtotals. The inner
  *    aggregate keeps full map-side combine (bucket count ≪ rows per
  *    partition); the outer decimal aggregate touches only
  *    groups×BUCKETS rows, so the per-row decimal cost never meets
  *    the fact stream. Per-bucket margin at 100 TB: ~10¹⁷ of 9.2×10¹⁸.
  *
  * Output casts preserve oracle equality: the per-group total is the
  * same exact rational both ways, and both `DECIMAL → DOUBLE` and
  * `exact-long → DOUBLE division` round that rational to the nearest
  * double once.
  */
object Money {
  private val dec280 = DecimalType(28, 0)

  val BUCKETS = 1024

  /** Exact cents (e2) of a 2-decimal money/rate double. */
  def e2(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  /** Exact 1e-4 units of price × (1 − discount): cents × (100 − disc_e2). */
  def revE4(ep: Column, disc: Column): Column =
    e2(ep) * (lit(100L) - e2(disc))

  /** Exact 1e-4 units of price × discount (q6's revenue form). */
  def prodE4(ep: Column, disc: Column): Column = e2(ep) * e2(disc)

  /** Deterministic aggregation salt from a high-cardinality column. */
  def bucket(c: Column): Column = pmod(xxhash64(c), lit(BUCKETS.toLong))

  /** Outer (cross-bucket) sum of per-bucket long subtotals in the
    * given scale, emitted as DOUBLE dollars. Decimal across ≤BUCKETS
    * rows per group — exact at any corpus size, negligible cost. */
  def outerE2(c: Column): Column = (sum(c.cast(dec280)) / 100).cast("double")
  def outerE4(c: Column): Column = (sum(c.cast(dec280)) / 10000).cast("double")

  /** Direct-grain conversions (high-cardinality keys, single level). */
  def e2ToDouble(c: Column): Column = (c.cast("double") / 100)
  def e4ToDouble(c: Column): Column = (c.cast("double") / 10000)

  /** Split exact sum — the low-cardinality-grain form WITHOUT the
    * bucket column. The two-level (group, hash-bucket) shape keeps
    * map-side combine, but multiplies the partial-aggregate grain by
    * BUCKETS: q7's first aggregate emitted 13.5M partial rows / ~1 GB
    * of exchange for 1 200 true groups at sf10 (nation strings riding
    * every bucket row). Splitting the e4 value digit-wise instead —
    * lo = v mod 1e6, hi = v div 1e6, each summed as a plain long —
    * keeps the partial aggregate at the group's OWN grain (1 200 rows
    * per task, exchange ~KB) and stays exact: total = hi·1e6 + lo
    * reassembled in DECIMAL at output grain (a row-level expression
    * over final groups, never the fact stream).
    *
    * Overflow headroom: requires v ≥ 0 (true for every revenue form
    * here — prices ≥ 0, discounts ≤ 100%). lo < 1e6 per row → the lo
    * sum needs >9.2×10¹² rows under ONE group (≳150× a 100 TB fact
    * stream in one group); hi ≤ ~1e3 per row (price ≤ $100k) → ~10¹⁶
    * at 100 TB. Both far inside long range; the map-side partials are
    * bounded by the same totals. */
  def splitLoE4(v: Column): Column = sum(v % lit(1000000L))
  // floor(v / 1e6) is exact here: the double quotient is correctly
  // rounded, v ≤ ~1e12 keeps its absolute error ≤ 2⁻⁵²·1e6 ≈ 2e-10,
  // and non-integer true quotients sit ≥ 1e-6 from the next integer —
  // so the floor can never cross a boundary (integer quotients are
  // exactly representable and round to themselves)
  def splitHiE4(v: Column): Column = sum(floor(v / lit(1000000L)).cast("long"))

  /** Reassemble split sums into DOUBLE dollars (e4 scale): the same
    * exact rational as the oracle's DECIMAL sum, one nearest-double
    * rounding on both paths. */
  def splitToDollarsE4(hi: Column, lo: Column): Column =
    ((hi.cast(dec280) * 1000000 + lo.cast(dec280)) / 10000).cast("double")
}
