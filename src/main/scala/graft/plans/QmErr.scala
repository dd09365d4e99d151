package graft.plans

/** Per-row weighted logistic error for the quality-model GD loop:
  *
  *   z   = Σ_i x_i·w_i + FP·w_F          (bias enters as x=FP)
  *   p   = clamp(W/2 + (z DIV FP) DIV 4, 0, W)   (hard sigmoid)
  *   err = (y·W − p) · (y = 1 ? cw : 1)
  *
  * Every division is truncation toward zero (Java `/` on longs ≡ Spark
  * DIV ≡ the sign-adjusted `//` the DuckDB oracle uses); the two-step
  * (z DIV FP) DIV 4 is kept as two divisions, not fused — they differ
  * on negative z.
  *
  * Form history (each round fixed the next bottleneck down): r18
  * inlined the clamped sigmoid into all 17 gradient sums (17× codegen
  * blowup); r19 computed err once per row in a SQL projection but
  * inlined the 17 EVOLVING weights as literals, so every GD step paid
  * a fresh Janino compile; r20 made this a Catalyst expression taking
  * the weights as one reference object so generated code was
  * byte-identical across steps and the codegen cache served steps
  * 2..QM_MAX; r21 removed per-step Catalyst entirely — the loop now
  * runs as treeAggregate over a persisted primitive-vector RDD
  * (PretrainOps.qmStep, the MLlib batch-GD architecture) and this
  * scalar is the arithmetic contract both that loop and the historical
  * SQL forms share. */
object QmErr {

  def err(z: Long, y: Long, w: Array[Long], wW: Long, cw: Long, fp: Long): Long = {
    var p = wW / 2 + ((z / fp) / 4)
    if (p < 0L) p = 0L else if (p > wW) p = wW
    (y * wW - p) * (if (y == 1L) cw else 1L)
  }
}
