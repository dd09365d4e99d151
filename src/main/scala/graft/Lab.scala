package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only plan laboratory: times named experiment plans against a
  * data dir with the same session config as QTime/Bench. Used to
  * decompose a slow query into its stage costs (scan / exchange / agg /
  * join variants) before choosing the production plan. Not part of the
  * driver contract; results land in PROGRESS notes + SURVEY §8g.
  *
  * Usage: runMain graft.Lab <sfDir> <experiment> [...]
  */
object Lab {
  private val dec184 = DecimalType(18, 4)

  private def skyRev(s: SparkSession, d: String) = {
    import Tables._
    lineitem(s, d).select(col("l_suppkey"), col("l_partkey"),
      (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
        (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))).as("rev_e4"))
  }

  def experiments(s: SparkSession, d: String): Map[String, () => DataFrame] = {
    import Tables._
    def li = lineitem(s, d)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    def oc = {
      val cust = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = orders(s, d).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .select(ord("o_orderkey"), ord("o_orderdate"))
    }
    def q3body(ocSide: DataFrame, liSide: DataFrame): DataFrame =
      liSide.join(ocSide, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec184))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)

    Map(
      // r19: the trained-PQ promotion decision (verdict #7) — end-to-
      // end lane cost of the first-k codebook vs per-subspace Lloyd
      "pq_firstk" -> (() => operators.SimilarityOps.simPqTopk(s, d)),
      "pq_trained" -> (() => operators.SimilarityOps.simPqTopkTrained(s, d)),
      "li_scan" -> (() => li.groupBy().agg(count(lit(1)).as("n"))),
      "li_scan_sumdec" -> (() => li.groupBy().agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec184)).as("s"))),
      "li_scan_sumdbl" -> (() => li.groupBy().agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("s"))),
      "li_agg_orderkey_dec" -> (() => li
        .groupBy("l_orderkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec184)).as("s"))
        .groupBy().agg(count(lit(1)).as("n"))),
      "li_agg_orderkey_dbl" -> (() => li
        .groupBy("l_orderkey")
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("s"))
        .groupBy().agg(count(lit(1)).as("n"))),
      "li_exchange_only" -> (() => li
        .repartition(col("l_orderkey"))
        .groupBy().agg(count(lit(1)).as("n"))),
      "oc_build" -> (() => oc.groupBy().agg(count(lit(1)).as("n"))),
      "q3_join_count_bcast" -> (() => li.join(broadcast(oc),
        col("l_orderkey") === col("o_orderkey")).groupBy().agg(count(lit(1)).as("n"))),
      "q3_join_count_shj" -> (() => li.join(oc.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey")).groupBy().agg(count(lit(1)).as("n"))),
      "q3_agg_after_bcast" -> (() => li.join(broadcast(oc),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec184)).as("s"))
        .groupBy().agg(count(lit(1)).as("n"))),
      "q3_preagg_shj" -> (() => {
        val rev = li.groupBy("l_orderkey")
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec184))
            .cast("double").as("revenue"))
        rev.join(oc.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"),
            col("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      }),
      "q3_preagg_bcast" -> (() => {
        val rev = li.groupBy("l_orderkey")
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec184))
            .cast("double").as("revenue"))
        rev.join(broadcast(oc), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"),
            col("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      }),
      "q3_smj" -> (() => q3body(oc, li)),
      "q3_shj" -> (() => q3body(oc.hint("shuffle_hash"), li)),
      "q3_bcast" -> (() => q3body(broadcast(oc), li)),
      "q3_merge_hint" -> (() => q3body(oc.hint("merge"), li)),

      // ---- r20: q18 BUCKETED decomposition (verdict #3) — stage
      // costs of the promoted layout plan: bare bucketed scan floor,
      // + the exchange-free order-grain aggregate, + the full lane
      // (its two AQE-broadcast joins on the ~1% qualifying set) ----
      "q18b_scan" -> (() => {
        val (_, lt) = operators.BucketedQueries.ensureBucketed(s, d)
        s.table(lt).select("l_orderkey", "l_quantity")
          .groupBy().agg(count(lit(1)).as("n"))
      }),
      "q18b_agg" -> (() => {
        val (_, lt) = operators.BucketedQueries.ensureBucketed(s, d)
        s.table(lt).select("l_orderkey", "l_quantity")
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("long")).as("qty_l"))
          .filter(col("qty_l") > 250L)
          .groupBy().agg(count(lit(1)).as("n"))
      }),
      "q18b_full" -> (() => operators.BucketedQueries.q18Bucketed(s, d)),
      // ---- q18 variants: the 15M-group quantity aggregate ----
      "q18_current" -> (() => operators.OlapQueries.queries("q18_large_orders")(s, d)),
      "q18_longsum" -> (() => {
        val big = lineitem(s, d).groupBy("l_orderkey")
          .agg((sum(expr("CAST(rint(l_quantity * 10000) AS BIGINT)")) / 10000.0).as("sum_qty"))
          .filter(col("sum_qty") > 250.0)
        big.join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_totalprice"), col("sum_qty"))
      }),
      "q18_agg_only_dec" -> (() => lineitem(s, d).groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(dec184)).cast("double").as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
        .groupBy().agg(count(lit(1)).as("n"), sum("sum_qty").as("s"))),
      "q18_agg_only_long" -> (() => lineitem(s, d).groupBy("l_orderkey")
        .agg((sum(expr("CAST(rint(l_quantity * 10000) AS BIGINT)")) / 10000.0).as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
        .groupBy().agg(count(lit(1)).as("n"), sum("sum_qty").as("s"))),

      // ---- pareto variants: per-customer revenue aggregate ----
      "pareto_agg_dec" -> (() => orders(s, d).groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("cust_rev"))
        .groupBy().agg(count(lit(1)).as("n"))),
      "pareto_agg_long" -> (() => orders(s, d).groupBy("o_custkey")
        .agg(sum(expr("CAST(rint(o_totalprice * 100) AS BIGINT)")).as("cust_rev_c"))
        .groupBy().agg(count(lit(1)).as("n"))),
      "pareto_current" -> (() => operators.OlapQueries.queries("q_pareto")(s, d)),
      "pareto_dist_current" -> (() => operators.OlapQueries.queries("q_pareto_dist")(s, d)),

      // ---- skyline decomposition (r13): where do the 2.5 s go? ----
      "sky_scan_expr" -> (() => skyRev(s, d)
        .groupBy().agg(sum("rev_e4").as("s"), count(lit(1)).as("n"))),
      "sky_exchange_only" -> (() => skyRev(s, d).repartition(col("l_suppkey"))
        .groupBy().agg(sum("rev_e4").as("s"), count(lit(1)).as("n"))),
      "sky_pair_agg" -> (() => skyRev(s, d).repartition(col("l_suppkey"))
        .groupBy("l_suppkey", "l_partkey").agg(sum("rev_e4").as("p"))
        .groupBy().agg(sum("p").as("s"), count(lit(1)).as("n"))),
      "sky_supp_agg" -> (() => skyRev(s, d).repartition(col("l_suppkey"))
        .groupBy("l_suppkey", "l_partkey").agg(sum("rev_e4").as("p"))
        .groupBy("l_suppkey").agg(sum("p").as("s"), count(lit(1)).as("np"))
        .groupBy().agg(sum("s").as("ss"), count(lit(1)).as("n"))),
      "sky_current" -> (() => operators.OlapQueries.queries("q_skyline")(s, d)),

      // ---- text_logprob variants ----
      "logprob_current" -> (() => operators.TextOps.queries("text_logprob")(s, d)),
      "logprob_native" -> (() => {
        plans.ShingleExprs.register(s)
        val toks = documents(s, d)
          .select(col("doc_id"), explode(expr("graft_token_hashes(text)")).as("h"))
        val vocab = toks.groupBy(col("h").as("h_v")).agg(count(lit(1)).as("tf"))
        val totalDf = vocab.agg(sum("tf").cast("double").as("total_toks"))
        val ln10 = 2.302585092994046
        toks.join(broadcast(vocab), col("h") === col("h_v"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            avg(log(col("tf").cast("double"))).as("mean_ln_tf"))
          .crossJoin(broadcast(totalDf))
          .select(col("doc_id"), col("n_tokens"),
            (floor((col("mean_ln_tf") - log(col("total_toks"))) / ln10 * 10000 + 0.5) / 10000)
              .as("mean_logp"))
      }),
      "logprob_explode_only" -> (() => documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), xxhash64(col("tok")).as("h"))
        .groupBy().agg(count(lit(1)).as("n"), sum("h").as("s"))),
      "logprob_explode_native" -> (() => {
        plans.ShingleExprs.register(s)
        documents(s, d)
          .select(col("doc_id"), explode(expr("graft_token_hashes(text)")).as("h"))
          .groupBy().agg(count(lit(1)).as("n"), sum("h").as("s"))
      }),

      // ---- r21: text_clean_boilerplate A/B (r20 verdict #3) — the
      // shared-exchange form (shipped in 8419a1c) vs the pre-8419a1c
      // chained-groupBy form, timed in ONE session so the driver's
      // cross-window regression reading can be reconciled ----
      "tcb_shared" -> (() => operators.TextOps.queries("text_clean_boilerplate")(s, d)),
      "tcb_chained" -> (() => operators.TextOps.textCleanBoilerplateChained(s, d)),

      // ---- r21: stream_join lane decomposition (the r18 attr_*
      // discipline, now actually registered): source floor = both
      // filtered sides scanned + parquet-sunk, NO join; inner = the
      // stream-stream join without outer state. lane − inner ≈ outer
      // hold/emit; inner − floor ≈ join state-store cost ----
      "sj_floor" -> (() => streaming.StreamOps.probeSourceFloor(s, d)),
      "sj_inner" -> (() => streaming.StreamOps.probeInner(s, d)),
      "sj_full_lane" -> (() => streaming.StreamOps.queries("stream_join")(s, d)),

      // ---- q9 exchange-grain A/B (r15): the part filter already thins
      // lines to ~1 per order, so the (orderkey, nationkey) pre-agg may
      // get no map-side combine — measure all three forms ----
      "q9_current" -> (() => operators.OlapQueries.queries("q9_profit")(s, d)),
      "q9_v14" -> (() => {
        import operators.Money
        val p = part(s, d).filter(col("p_name").contains("red"))
          .select(col("p_partkey"), Money.e2(col("p_retailprice")).as("retail_e2"))
        val l = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"),
          Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
        val supN = nation(s, d).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("nation"))
        val o = orders(s, d).select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .withColumn("cost_e4",
            col("retail_e2") * col("l_quantity").cast("long") * 100L)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("nation", "o_year")
          .agg(Money.splitLoE4(col("r")).as("rlo"), Money.splitHiE4(col("r")).as("rhi"),
            Money.splitLoE4(col("cost_e4")).as("clo"),
            Money.splitHiE4(col("cost_e4")).as("chi"))
          .select(col("nation"), col("o_year"),
            (Money.splitToDollarsE4(col("rhi"), col("rlo")) -
              Money.splitToDollarsE4(col("chi"), col("clo"))).as("profit"))
      }),
      "q9_intkey" -> (() => {
        import operators.Money
        val p = part(s, d).filter(col("p_name").contains("red"))
          .select(col("p_partkey"), Money.e2(col("p_retailprice")).as("retail_e2"))
        val l = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"),
          Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
        val supN = nation(s, d).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("nation"))
        val o = orders(s, d).select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .withColumn("cost_e4",
            col("retail_e2") * col("l_quantity").cast("long") * 100L)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .hint("shuffle_hash")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("s_nationkey", "o_year")
          .agg(Money.splitLoE4(col("r")).as("rlo"), Money.splitHiE4(col("r")).as("rhi"),
            Money.splitLoE4(col("cost_e4")).as("clo"),
            Money.splitHiE4(col("cost_e4")).as("chi"))
          .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
          .select(col("nation"), col("o_year"),
            (Money.splitToDollarsE4(col("rhi"), col("rlo")) -
              Money.splitToDollarsE4(col("chi"), col("clo"))).as("profit"))
      }),

      // ---- q8 exchange-grain A/B (r15) ----
      "q8_current" -> (() => operators.OlapQueries.queries("q8_market_share")(s, d)),
      "q8_v14" -> (() => {
        import operators.Money
        val l = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
          Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
        val supN = nation(s, d).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val o = orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year"))
        val custAsia = customer(s, d).select("c_custkey", "c_nationkey")
          .join(broadcast(nation(s, d).select(
            col("n_nationkey").as("cn_key"), col("n_regionkey"))),
            col("c_nationkey") === col("cn_key"))
          .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")
            .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        val oc = o.join(custAsia, col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "o_year")
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
          .select(col("l_orderkey"), col("r"),
            (col("supp_nation") === "NATION_7").as("is_t"))
          .join(oc, col("l_orderkey") === col("o_orderkey"))
          .withColumn("tr", when(col("is_t"), col("r")).otherwise(lit(0L)))
          .groupBy("o_year")
          .agg(Money.splitLoE4(col("tr")).as("tlo"), Money.splitHiE4(col("tr")).as("thi"),
            Money.splitLoE4(col("r")).as("alo"), Money.splitHiE4(col("r")).as("ahi"))
          .select(col("o_year"),
            (floor(Money.splitToDollarsE4(col("thi"), col("tlo")) /
              Money.splitToDollarsE4(col("ahi"), col("alo")) * 1e6 + 0.5) / 1e6)
              .as("mkt_share"))
      }),

      // ---- q2 exchange-count A/B (r15): groupBy(pk,sk) then window(pk)
      // plans TWO pair-grain exchanges; one up-front repartition(pk)
      // satisfies both (subset rule) ----
      "q2_current" -> (() => operators.ExtendedQueries.queries("q2_min_cost_supplier")(s, d)),
      "q2_onex" -> (() => {
        import org.apache.spark.sql.expressions.Window
        val li = lineitem(s, d)
        val p = part(s, d).filter(col("p_size") <= 10)
        val sup = supplier(s, d)
        val n = nation(s, d)
        val r = region(s, d).filter(col("r_name") === "EUROPE")
        val euroSup = sup
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val cost = li
          .join(broadcast(p.select("p_partkey")), li("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") / col("l_quantity")).as("uc"))
          .repartition(col("l_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("uc")).as("unit_cost"))
        val w = Window.partitionBy("l_partkey")
        cost
          .withColumn("min_cost", min("unit_cost").over(w))
          .filter(col("unit_cost") === col("min_cost"))
          .join(euroSup, col("l_suppkey") === col("s_suppkey"), "left_semi")
          .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"),
            (floor(col("unit_cost") * 10000 + 0.5) / 10000).as("min_unit_cost"))
      }),

      // ---- q_json_extract A/B (r15): per-row get_json_object vs
      // from_json vs Spark 4 VARIANT (parse once, typed path get) ----
      "json_current" -> (() => operators.CoreQueries.queries("q_json_extract")(s, d)),
      "json_fromjson" -> (() => events(s, d)
        .withColumn("k", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))),
      "json_variant" -> (() => events(s, d)
        .withColumn("k", expr("variant_get(try_parse_json(props), '$.k', 'long')"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))),

      // ---- q7 / q5 / q10 with shuffle_hash hints on the fact joins ----
      "q7_current" -> (() => operators.OlapQueries.queries("q7_volume")(s, d)),
      "q7_shj" -> (() => {
        val l = lineitem(s, d).filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select("l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount")
        val o = orders(s, d).select("o_orderkey", "o_custkey")
        val c = customer(s, d).select("c_custkey", "c_nationkey")
        val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
        val supN = nation(s, d).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val custN = nation(s, d).select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .join(c.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
          .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(dec184)).cast("double").as("volume"))
      }),
      "q5_current" -> (() => operators.CoreQueries.queries("q5_multi_join")(s, d)),
      "q10_current" -> (() => operators.OlapQueries.queries("q10_returned")(s, d)),
      "q10_shj" -> (() => {
        val o = orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val l = lineitem(s, d).filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val c = customer(s, d)
          .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
        l.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .join(c.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(dec184)).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      }),
      "q10_preagg" -> (() => {
        // aggregate revenue at custkey grain BEFORE the customer join:
        // the wide (name, acctbal) columns never ride an exchange, and
        // the post-agg side is small enough for AQE to broadcast
        val o = orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val l = lineitem(s, d).filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val rev = l.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(dec184)).cast("double").as("revenue"))
        rev.join(customer(s, d)
            .select("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            col("c_acctbal"), col("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      }),
      "q4_current" -> (() => operators.OlapQueries.queries("q4_order_priority")(s, d)),
      "q4_bcast_distinct" -> (() => {
        // EXISTS via broadcast inner join + distinct-orderkey agg: the
        // quarter-order side broadcasts, lineitem streams map-side, and
        // the only exchange carries the ~matching-order grain
        val o = orders(s, d).filter(
          col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val l = lineitem(s, d).select("l_orderkey", "l_shipdate")
        l.join(broadcast(o),
            col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"))
          .groupBy("o_orderkey", "o_orderpriority")
          .agg(count(lit(1)).as("nl"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      }),
      "q4_maxship" -> (() => {
        // EXISTS(l.shipdate > o.date) == max(l.shipdate) per order > o.date:
        // orderkey-clustered layout gives the pre-agg full map-side combine
        val o = orders(s, d).filter(
          col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val lmax = lineitem(s, d).select("l_orderkey", "l_shipdate")
          .groupBy("l_orderkey").agg(max("l_shipdate").as("max_ship"))
        lmax.join(broadcast(o),
            col("l_orderkey") === col("o_orderkey") &&
            col("max_ship") > col("o_orderdate"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      }),
      "sky_current" -> (() => operators.OlapQueries.queries("q_skyline")(s, d)),
      "sky_agg_expand" -> (() => lineitem(s, d)
        .groupBy("l_suppkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec184)).as("r"),
          countDistinct("l_partkey").as("np"))
        .groupBy().agg(count(lit(1)).as("n"))),
      "sky_agg_twophase" -> (() => lineitem(s, d)
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec184)).as("pr"))
        .groupBy("l_suppkey")
        .agg(sum("pr").as("r"), count(lit(1)).as("np"))
        .groupBy().agg(count(lit(1)).as("n"))),
      "evt_current" -> (() => operators.OlapQueries.queries("q_event_transitions")(s, d)),
      "q18_aggonly" -> (() => lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
        .groupBy().agg(count(lit(1)).as("n"))),
      "q18_aggonly_dbl" -> (() => lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
        .groupBy().agg(count(lit(1)).as("n"))),
      "q3_now" -> (() => operators.CoreQueries.queries("q3_join_agg")(s, d)),
      "q3_preagg_long" -> (() => {
        // aggregate to order grain BEFORE the join: clustered layout
        // gives full map-side combine, the exchange carries (key, long)
        val cust = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val ord = orders(s, d).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        val oc = ord.join(cust, ord("o_custkey") === cust("c_custkey"))
          .select(ord("o_orderkey"), ord("o_orderdate"))
        val rev = lineitem(s, d)
          .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
          .select(col("l_orderkey"),
            operators.Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
          .groupBy("l_orderkey").agg(sum("r").as("rev_e4"))
        rev.join(oc.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"),
            col("rev_e4"))
          .orderBy(col("rev_e4").desc, col("l_orderkey"))
          .limit(10)
          .select(col("l_orderkey"), col("orderdate"),
            operators.Money.e4ToDouble(col("rev_e4")).as("revenue"))
      }),
      "q3_mapside_e4" -> (() => {
        // same join order as production, but rev_e4 computed BEFORE the
        // fact exchange so it carries (orderkey, long) not (ep, disc)
        val cust = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val ord = orders(s, d).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        val oc = ord.join(cust, ord("o_custkey") === cust("c_custkey"))
          .select(ord("o_orderkey"), ord("o_orderdate"))
        val li = lineitem(s, d)
          .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
          .select(col("l_orderkey"),
            operators.Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        li.join(oc.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"))
          .agg(sum("r").as("rev_e4"))
          .orderBy(col("rev_e4").desc, col("l_orderkey"))
          .limit(10)
          .select(col("l_orderkey"), col("orderdate"),
            operators.Money.e4ToDouble(col("rev_e4")).as("revenue"))
      }),
      "q7_now" -> (() => operators.OlapQueries.queries("q7_volume")(s, d)),
      "q7_aqe_cust" -> (() => {
        // the shipped shape but with NO join hints: AQE sees the
        // measured post-shuffle sizes (customer slims to 2 ints) and
        // may convert both fact joins to broadcast at bench scale
        val l = lineitem(s, d).filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).as("l_year"),
            operators.Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        val oc = orders(s, d).select("o_orderkey", "o_custkey")
          .join(customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_nationkey"))
        val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
        val supN = nation(s, d).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val custN = nation(s, d).select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(oc, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
          .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"),
            operators.Money.bucket(col("l_orderkey")).as("mb"))
          .agg(sum(col("r")).as("v_e4"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(operators.Money.outerE4(col("v_e4")).as("volume"))
      }),
      "q7_split" -> (() => {
        // split-long exact sums: ONE aggregate at the true
        // (supp_nation, cust_nation, year) grain — no Money.bucket
        // column, so the partial aggregate combines to 1 200 rows per
        // task instead of 13.5M and the exchange is KBs, not ~1 GB
        val l = lineitem(s, d).filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).as("l_year"),
            operators.Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        val oc = orders(s, d).select("o_orderkey", "o_custkey")
          .join(customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_nationkey"))
        val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
        val supN = nation(s, d).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val custN = nation(s, d).select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(oc, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
          .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(operators.Money.splitLoE4(col("r")).as("lo"),
            operators.Money.splitHiE4(col("r")).as("hi"))
          .select(col("supp_nation"), col("cust_nation"), col("l_year"),
            operators.Money.splitToDollarsE4(col("hi"), col("lo")).as("volume"))
      }),
      "q7_bkt_split" -> (() => {
        // bucketed fact join + split-long sums: the zero-exchange fact
        // join AND the true-grain partial aggregate together
        val (ot, lt) = operators.BucketedQueries.ensureBucketed(s, d)
        val l = s.table(lt)
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).as("l_year"),
            operators.Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        val o = s.table(ot).select("o_orderkey", "o_custkey")
        val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
        val supN = nation(s, d).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val custN = nation(s, d).select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
          .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(operators.Money.splitLoE4(col("r")).as("lo"),
            operators.Money.splitHiE4(col("r")).as("hi"))
          .select(col("supp_nation"), col("cust_nation"), col("l_year"),
            operators.Money.splitToDollarsE4(col("hi"), col("lo")).as("volume"))
      }),
      "q7_bkt" -> (() => {
        // bucketed twin probe: orderkey-bucketed lineitem ⋈ orders
        // co-located (zero exchange on the fact join), customer join
        // AQE-decided
        val (ot, lt) = operators.BucketedQueries.ensureBucketed(s, d)
        val l = s.table(lt)
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).as("l_year"),
            operators.Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        val o = s.table(ot).select("o_orderkey", "o_custkey")
        val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
        val supN = nation(s, d).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val custN = nation(s, d).select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
          .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"),
            operators.Money.bucket(col("l_orderkey")).as("mb"))
          .agg(sum(col("r")).as("v_e4"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(operators.Money.outerE4(col("v_e4")).as("volume"))
      }),
      "q7_mapside_e4" -> (() => {
        val l = lineitem(s, d).filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).as("l_year"),
            operators.Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        val o = orders(s, d).select("o_orderkey", "o_custkey")
        val c = customer(s, d).select("c_custkey", "c_nationkey")
        val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
        val supN = nation(s, d).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val custN = nation(s, d).select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
          .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"),
            operators.Money.bucket(col("l_orderkey")).as("mb"))
          .agg(sum(col("r")).as("v_e4"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(operators.Money.outerE4(col("v_e4")).as("volume"))
      }),
      "q7_oc_first" -> (() => {
        // orders⋈customer first (both slim) → ONE line-grain exchange:
        // the current plan re-exchanges the joined line stream on
        // custkey — a second fact-scale Exchange this shape avoids
        val l = lineitem(s, d).filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).as("l_year"),
            operators.Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        val oc = orders(s, d).select("o_orderkey", "o_custkey")
          .join(customer(s, d).select("c_custkey", "c_nationkey").hint("shuffle_hash"),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_nationkey"))
        val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
        val supN = nation(s, d).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val custN = nation(s, d).select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(oc.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
          .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"),
            operators.Money.bucket(col("l_orderkey")).as("mb"))
          .agg(sum(col("r")).as("v_e4"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(operators.Money.outerE4(col("v_e4")).as("volume"))
      }),
      "sky_np_current" -> (() => lineitem(s, d)
        .select(col("l_suppkey").as("np_suppkey"), col("l_partkey")).distinct()
        .groupBy(col("np_suppkey")).agg(count(lit(1)).as("n_parts"))
        .agg(sum("n_parts").as("x"))),
      "sky_np_packed" -> (() => {
        // single-long pair key + explicit pre-partitioning: the
        // distinct's partial aggregate (which dedups ~1% of rows at
        // 2.5 us/row) is elided because the child is already
        // hash-partitioned on the key
        val stride = lineitem(s, d).agg(max("l_partkey")).head.getLong(0) + 1L
        lineitem(s, d)
          .select((col("l_suppkey") * stride + col("l_partkey")).as("pk"))
          .repartition(col("pk"))
          .distinct()
          .select((col("pk") / stride).cast("long").as("np_suppkey"))
          .groupBy("np_suppkey").agg(count(lit(1)).as("n_parts"))
          .agg(sum("n_parts").as("x"))
      }),
      "sky_full_packed" -> (() => {
        // full q_skyline with the fact stage as: revenue per SUPPKEY
        // directly (100k-group partial combine — no spill) + distinct
        // pairs as PACKED longs (8B hash-set entries, ~1/3 the pair
        // aggregate's memory) counted per supplier, joined at supplier
        // grain. Two exchanges, neither pathological.
        import org.apache.spark.sql.expressions.Window
        val stride = 1L << 22 // > max l_partkey at any tested SF
        val li = lineitem(s, d)
        val rev = li.select(col("l_suppkey"),
            (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
              (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))).as("rev_e4"))
          .groupBy("l_suppkey").agg(sum("rev_e4").as("srev_e4"))
        val np = li.select((col("l_suppkey") * stride + col("l_partkey")).as("pk"))
          .distinct()
          .select(floor(col("pk") / stride).cast("long").as("np_suppkey"))
          .groupBy("np_suppkey").agg(count(lit(1)).as("n_parts"))
        val m = rev.join(np, col("l_suppkey") === col("np_suppkey"))
          .select(col("l_suppkey"),
            (expr("(srev_e4 + 50) DIV 100").cast("double") / 100).as("revenue"),
            col("n_parts"))
        val sup = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        val nat = nation(s, d).select(col("n_nationkey"), col("n_name"))
        val j = m.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("l_suppkey").as("suppkey"),
            col("revenue"), col("n_parts"))
        val pairs = j.select("nation", "revenue", "n_parts")
          .repartition(col("nation")).dropDuplicates("nation", "revenue", "n_parts")
        val w = Window.partitionBy("nation")
          .orderBy(col("revenue").desc, col("n_parts").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val sky = pairs.withColumn("mx", max("n_parts").over(w))
          .filter(col("mx").isNull || col("mx") < col("n_parts"))
          .select(col("nation").as("sk_n"), col("revenue").as("sk_r"),
            col("n_parts").as("sk_p"))
        j.join(broadcast(sky),
          col("nation") === col("sk_n") && col("revenue") === col("sk_r") &&
            col("n_parts") === col("sk_p"), "left_semi")
          .orderBy(col("nation"), col("revenue").desc, col("suppkey"))
      }),
      "sky_pair_packed" -> (() => {
        // the current single-scan shape but with the pair key PACKED
        // into one long before the pair-grain aggregate (24B -> 16B
        // hash entries; the r13 plan spills 5.8 GB per aggregate at
        // sf10 because orderkey-clustered tasks see ~unique pairs)
        val stride = 1L << 22
        lineitem(s, d)
          .select((col("l_suppkey") * stride + col("l_partkey")).as("pk"),
            (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
              (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))).as("rev_e4"))
          .groupBy("pk").agg(sum("rev_e4").as("prev_e4"))
          .select(floor(col("pk") / stride).cast("long").as("sk"), col("prev_e4"))
          .groupBy("sk")
          .agg(sum("prev_e4").as("srev_e4"), count(lit(1)).as("n_parts"))
          .agg(sum("srev_e4").as("a"), sum("n_parts").as("b"))
      }),
      "sky_fact_now" -> (() => {
        // the shipped fact stage alone (pair-grain partial+final)
        lineitem(s, d)
          .select(col("l_suppkey"), col("l_partkey"),
            (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
              (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))).as("rev_e4"))
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum("rev_e4").as("prev_e4"))
          .groupBy(col("l_suppkey"))
          .agg(sum("prev_e4").as("srev_e4"), count(lit(1)).as("n_parts"))
          .agg(sum("srev_e4").as("a"), sum("n_parts").as("b"))
      }),
      "sky_fact_split" -> (() => {
        // revenue per suppkey + packed distinct pairs (no join back —
        // the two fact stages alone, for cost attribution)
        val stride = 1L << 22
        val li = lineitem(s, d)
        val rev = li.select(col("l_suppkey"),
            (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
              (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))).as("rev_e4"))
          .groupBy("l_suppkey").agg(sum("rev_e4").as("srev_e4"))
        val np = li.select((col("l_suppkey") * stride + col("l_partkey")).as("pk"))
          .distinct()
          .select(floor(col("pk") / stride).cast("long").as("np_suppkey"))
          .groupBy("np_suppkey").agg(count(lit(1)).as("n_parts"))
        rev.join(np, col("l_suppkey") === col("np_suppkey"))
          .agg(sum("srev_e4").as("a"), sum("n_parts").as("b"))
      }),
      "sky_bkt" -> (() =>
        operators.BucketedQueries.qSkylineBucketed(s, d)),
      "q8_current" -> (() => operators.OlapQueries.q8MarketShare(s, d)),
      "fuzzy_screened" -> (() =>
        operators.ExtendedQueries.queries("text_fuzzy_pairs")(s, d)
          .groupBy().agg(count(lit(1)).as("n"), sum("lev").as("sl"))),
      "fuzzy_unscreened" -> (() => {
        val docs = documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"),
            expr("n_chars div 50").as("len_band"),
            substring(col("text"), 1, 60).as("prefix"))
        val a = docs.select(col("lang"), col("source"), col("len_band"),
          col("doc_id").as("doc_a"), col("prefix").as("pref_a"))
        val b = docs.select(col("lang").as("lang_b"), col("source").as("source_b"),
          col("len_band").as("len_band_b"),
          col("doc_id").as("doc_b"), col("prefix").as("pref_b"))
        a.join(b,
            col("lang") === col("lang_b") && col("source") === col("source_b") &&
            col("len_band") === col("len_band_b") && col("doc_a") < col("doc_b"))
          .withColumn("lev", levenshtein(col("pref_a"), col("pref_b"), 21))
          .filter(col("lev").between(0, 20))
          .groupBy().agg(count(lit(1)).as("n"), sum("lev").as("sl"))
      }),
      "pr_conv_current" -> (() => operators.GraphOps.qPagerankConverged(s, d)),
      "pr_conv_copart" -> (() => {
        // r16 experiment: co-partition ids/edges/ranks ONCE on the join
        // keys, force shuffle-hash, disable AQE inside the loop — every
        // iteration then has exactly ONE exchange (the groupBy(dst))
        // and ZERO per-iteration broadcast builds.
        import graft.Tables._
        val SCALE = 1000000000000L
        val K = 3
        val PR_EPS = SCALE / 1000000L
        val PR_MAX = 26
        val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
        val nDocs0 = documents(s, d).count()
        val P = math.max(8, math.min(
          s.conf.get("spark.sql.shuffle.partitions").toInt,
          (nDocs0 / 100000L).toInt))
        s.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
          val ids = documents(s, d).select(col("doc_id")).crossJoin(broadcast(nDocs))
            .repartition(P, col("doc_id")).localCheckpoint(true)
          val edges = ids.select(col("doc_id").as("src"),
            explode(array((1 to K).map(k =>
              conv(substring(md5(concat(lit("pr:"), col("doc_id"), lit(s":$k"))), 1, 8), 16, 10)
                .cast("long") % col("n_docs")): _*)).as("dst"))
            .repartition(P, col("src")).localCheckpoint(true)
          var ranks = ids.select(col("doc_id").as("rid"),
            expr(s"$SCALE DIV n_docs").as("p")).localCheckpoint(true)
          var it = 0
          var converged = false
          while (!converged && it < PR_MAX) {
            val insum = edges.join(ranks.hint("shuffle_hash"),
                col("src") === col("rid"))
              .groupBy(col("dst")).agg(sum(expr(s"p DIV $K")).as("insum"))
            val next = ids.join(insum.hint("shuffle_hash"),
                col("doc_id") === col("dst"), "left")
              .select(col("doc_id").as("rid"),
                (expr(s"(15 * ($SCALE DIV n_docs)) DIV 100") +
                  expr("(85 * coalesce(insum, 0)) DIV 100")).as("p"))
              .localCheckpoint(false)
            val delta = next
              .join(ranks.select(col("rid").as("rid0"), col("p").as("p0"))
                .hint("shuffle_hash"), col("rid") === col("rid0"))
              .agg(sum(abs(col("p") - col("p0")))).head().getLong(0)
            ranks = next
            it += 1
            converged = delta <= PR_EPS
          }
          val indeg = edges.groupBy(col("dst").as("ind_id"))
            .agg(count(lit(1)).as("in_deg"))
          ids.select(col("doc_id"))
            .join(indeg, col("doc_id") === col("ind_id"), "left")
            .join(ranks, col("doc_id") === col("rid"))
            .select(col("doc_id"),
              coalesce(col("in_deg"), lit(0L)).as("in_deg"),
              col("p").as("pr"), lit(it.toLong).as("n_iters"))
            .orderBy(col("pr").desc, col("doc_id").asc)
            .limit(100)
        } finally s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }),
      "q8_oc_probe" -> (() => {
        // scan + the ONE oc probe (no supplier joins, no year agg):
        // isolates the probe cost over 60M rows
        import operators.Money
        val l = lineitem(s, d).select(col("l_orderkey"),
          Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        val o = orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year"))
        val custAsia = customer(s, d).select("c_custkey", "c_nationkey")
          .join(broadcast(nation(s, d).select(
            col("n_nationkey").as("cn_key"), col("n_regionkey"))),
            col("c_nationkey") === col("cn_key"))
          .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")
            .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        val oc = o.join(broadcast(custAsia), col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "o_year")
        l.join(broadcast(oc), col("l_orderkey") === col("o_orderkey"))
          .groupBy().agg(sum(col("r") % 1000000L).as("a"), count(lit(1)).as("n"))
      }),
      "q8_oc_build" -> (() => {
        // the oc side alone: orders scan + custAsia broadcast joins
        val o = orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year"))
        val custAsia = customer(s, d).select("c_custkey", "c_nationkey")
          .join(broadcast(nation(s, d).select(
            col("n_nationkey").as("cn_key"), col("n_regionkey"))),
            col("c_nationkey") === col("cn_key"))
          .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")
            .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        o.join(broadcast(custAsia), col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "o_year")
          .groupBy().agg(count(lit(1)).as("n"), sum("o_year").as("sy"))
      }),
      "q8_scan_floor" -> (() => {
        // lower bound for ANY q8 plan: one pass over lineitem computing
        // rev_e4 + one long sum (no joins, no filter)
        import operators.Money
        lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
          Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
          .groupBy().agg(sum(col("r") % 1000000L).as("a"), count(lit(1)).as("n"))
      }),
      "q8_bcast_oc" -> (() => {
        // r16 experiment: broadcast the qualifying (orderkey, year)
        // order list INTO the fact scan and aggregate at year grain
        // directly — deletes the order-grain pre-agg exchange (94% of
        // whose output the oc join discards). Split-long year sums over
        // line-grain rev_e4 (≤1e9 < the 1e12 exactness bound).
        import operators.Money
        val l = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
          Money.revE4(col("l_extendedprice"), col("l_discount")).as("r"))
        val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
        val supN = nation(s, d).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val o = orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year"))
        val custAsia = customer(s, d).select("c_custkey", "c_nationkey")
          .join(broadcast(nation(s, d).select(
            col("n_nationkey").as("cn_key"), col("n_regionkey"))),
            col("c_nationkey") === col("cn_key"))
          .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")
            .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        val oc = o.join(broadcast(custAsia), col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "o_year")
        val tr = when(col("supp_nation") === "NATION_7", col("r")).otherwise(lit(0L))
        // most selective probe FIRST: oc keeps ~6% of lines, so the
        // supplier/nation probes run on 3.6M rows instead of 60M
        l.join(broadcast(oc), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
          .groupBy("o_year")
          .agg(Money.splitLoE4(tr).as("tlo"), Money.splitHiE4(tr).as("thi"),
            Money.splitLoE4(col("r")).as("alo"), Money.splitHiE4(col("r")).as("ahi"))
          .select(col("o_year"),
            (floor(Money.splitToDollarsE4(col("thi"), col("tlo")) /
              Money.splitToDollarsE4(col("ahi"), col("alo")) * 1e6 + 0.5) / 1e6)
              .as("mkt_share"))
      }),
      "pareto_ntile_only" -> (() => {
        import org.apache.spark.sql.expressions.Window
        orders(s, d).groupBy("o_custkey")
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("cust_rev"))
          .withColumn("decile",
            ntile(10).over(Window.orderBy(col("cust_rev").desc, col("o_custkey"))))
          .groupBy().agg(count(lit(1)).as("n"))
      }),
      // ---- r17: the real-edge resolve join's skew (hot URL = doc 1
      // carries ~1.5n probe rows; run with SPARK_GRAFT_LAB_CONF=
      // "spark.sql.adaptive.skewJoin.enabled=false" for the off side)
      "realedges_build" -> (() =>
        operators.GraphOps.realEdges(s, d)
          .groupBy().agg(count(lit(1)).as("n_edges"), sum("outdeg"),
            max("dst"), max("src"))),
      // ---- r17: attribution floor decomposition -------------------------
      // stage 1 floor: the filtered scan + projection the window cannot
      // avoid (partial agg forces every column to be read, no exchange)
      "attr_scan_floor" -> (() =>
        events(s, d)
          .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("tsu"),
            col("event_type"), col("value"))
          .filter(col("event_type").isin("click", "view", "purchase"))
          .groupBy().agg(sum(col("user_id").cast("double")),
            sum(col("event_id").cast("double")), sum(col("tsu").cast("double")),
            count("event_type"), sum("value"))),
      // stage 2: scan + the user_id exchange + sort, NO window function
      // (sortWithinPartitions after repartition = the window's physical
      // prefix) — isolates what the window computation itself adds
      "attr_exchange_sort" -> (() =>
        events(s, d)
          .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("tsu"),
            col("event_type"), col("value"))
          .filter(col("event_type").isin("click", "view", "purchase"))
          .repartition(col("user_id"))
          .sortWithinPartitions("user_id", "tsu", "event_id")
          .groupBy().agg(sum(col("user_id").cast("double")),
            sum(col("event_id").cast("double")), sum(col("tsu").cast("double")),
            count("event_type"), sum("value"))),
      // the full production lane
      "attr_full" -> (() =>
        operators.BehaviorOps.queries("q_attribution")(s, d)),
      // r18: the row-grain twin's own register line — identical scan/
      // exchange/sort/window prefix as attr_full (same plan through the
      // window), plus the event_id % 251 sample filter and no final
      // rollup; its floor decomposition is attr_scan_floor /
      // attr_exchange_sort / THIS
      "attr_rows_full" -> (() =>
        operators.BehaviorOps.queries("q_attribution_rows")(s, d)),
      // r18: the real-edge CC lane's skew note — the per-round label
      // join probes the mega-hub's label from ~n symmetric edge rows;
      // run with SPARK_GRAFT_LAB_CONF=
      // "spark.sql.adaptive.skewJoin.enabled=false" for the off side
      "ccreal_full" -> (() =>
        operators.GraphOps.queries("q_components_real")(s, d)
          .groupBy().agg(count(lit(1)).as("n"), sum("comp"), max("comp_size"))),
      // r18: streaming outer-join decomposition (the attr_* discipline
      // on the real streaming engine): source floor (scan + parquet
      // sink, no join) / inner (join state + sink, no outer state) /
      // the production outer and full lanes
      "sjout_src_floor" -> (() => streaming.StreamOps.probeSourceFloor(s, d)),
      "sjout_inner" -> (() => streaming.StreamOps.probeInner(s, d)),
      "sjout_full" -> (() =>
        streaming.StreamOps.queries("stream_join_outer")(s, d)),
      "sjfull_full" -> (() =>
        streaming.StreamOps.queries("stream_join_full")(s, d)),
      // ---- r17: the fuzzy-pairs 510 s tail ------------------------------
      // the r16 production form: builtin banded DP after the bag screen
      "fuzzy_builtin_dp" -> (() => {
        graft.plans.BagLowerBound.register(s)
        fuzzyBlocked(s, d)
          .filter(call_function("graft_bag_lb", col("pref_a"), col("pref_b")) <= 20)
          .withColumn("lev", levenshtein(col("pref_a"), col("pref_b"), 21))
          .filter(col("lev").between(0, 20))
          .select("doc_a", "doc_b", "lev")
      }),
      // the r17 production form: Myers bit-parallel word DP (Lev64)
      "fuzzy_lev64" -> (() =>
        operators.ExtendedQueries.queries("text_fuzzy_pairs")(s, d)),
      // is the bag prescreen still worth 150 ops/pair when the verify
      // behind it costs ~900 instead of ~15k?
      "fuzzy_lev64_noscreen" -> (() => {
        graft.plans.Lev64.register(s)
        fuzzyBlocked(s, d)
          .withColumn("lev", call_function("graft_lev64",
            col("pref_a"), col("pref_b"), lit(20)))
          .filter(col("lev").between(0, 20))
          .select("doc_a", "doc_b", "lev")
      }),
      // stage census for the blocking argument: block-join candidates /
      // bag-screen survivors (pairs that reach the DP) / qualifying
      // output pairs. If out/bag_pass is high, the corpus is DENSE in
      // qualifying pairs and NO candidate-blocking scheme can prune
      // below the output count — the per-pair verify constant is the
      // only lever.
      "fuzzy_census" -> (() => {
        graft.plans.BagLowerBound.register(s)
        graft.plans.Lev64.register(s)
        fuzzyBlocked(s, d)
          .withColumn("bag_ok",
            (call_function("graft_bag_lb", col("pref_a"), col("pref_b")) <= 20)
              .cast("long"))
          .withColumn("out_ok", when(col("bag_ok") === 1L,
            (call_function("graft_lev64", col("pref_a"), col("pref_b"), lit(20)) >= 0)
              .cast("long")).otherwise(0L))
          .agg(count(lit(1)).as("n_candidates"),
            sum("bag_ok").as("n_bag_pass"),
            sum("out_ok").as("n_out"))
      }),
      // PassJoin-style probe (r16 verdict #1): LOWER bound on the
      // candidate count any segment-blocking scheme admits at k=20 on
      // 60-char prefixes. This aligned variant joins only segment i of
      // A to segment i of B at the SAME position — true PassJoin must
      // also admit shifted matches (insertions move positions by up to
      // k), so its candidate count is STRICTLY LARGER. If even this
      // undercount approaches the block cross product, segment
      // blocking loses to the bag screen + word DP.
      "fuzzy_passjoin_probe" -> (() => {
        val nSeg = 21 // k+1 pigeonhole segments for k=20
        val segs = fuzzyDocs(s, d).select(col("lang"), col("source"),
          col("len_band"), col("doc_id"),
          posexplode(split(rpad(col("prefix"), 63, " "),
            "(?<=\\G.{3})")).as(Seq("seg_id", "seg")))
          .filter(col("seg_id") < nSeg)
        val a = segs.select(col("lang"), col("source"), col("len_band"),
          col("seg_id"), col("seg"), col("doc_id").as("doc_a"))
        val b = segs.select(col("lang").as("lb_"), col("source").as("sb_"),
          col("len_band").as("bb_"), col("seg_id").as("gb_"),
          col("seg").as("segb_"), col("doc_id").as("doc_b"))
        a.join(b, col("lang") === col("lb_") && col("source") === col("sb_") &&
            col("len_band") === col("bb_") && col("seg_id") === col("gb_") &&
            col("seg") === col("segb_") && col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
          .agg(count(lit(1)).as("n_passjoin_candidates"))
      })
    )
  }

  private def fuzzyDocs(s: SparkSession, d: String): DataFrame = {
    import Tables._
    documents(s, d).select(col("doc_id"), col("lang"), col("source"),
      expr("n_chars div 50").as("len_band"),
      substring(col("text"), 1, 60).as("prefix"))
  }

  /** The fuzzy lane's capped block self-join (candidates only, no
    * verification) — shared by the r17 fuzzy experiments. */
  private def fuzzyBlocked(s: SparkSession, d: String): DataFrame = {
    val docs = fuzzyDocs(s, d)
    val blocks = docs.groupBy(col("lang").as("bl_lang"),
        col("source").as("bl_source"), col("len_band").as("bl_band"))
      .agg(count(lit(1)).as("n_block"))
      .filter(col("n_block") <= operators.ExtendedQueries.FUZZY_BLOCK_CAP)
    val bounded = docs.join(broadcast(blocks),
      col("lang") === col("bl_lang") && col("source") === col("bl_source") &&
        col("len_band") === col("bl_band"), "left_semi")
    val a = bounded.select(col("lang"), col("source"), col("len_band"),
      col("doc_id").as("doc_a"), col("prefix").as("pref_a"))
    val b = bounded.select(col("lang").as("lang_b"), col("source").as("source_b"),
      col("len_band").as("len_band_b"),
      col("doc_id").as("doc_b"), col("prefix").as("pref_b"))
    a.join(b,
      col("lang") === col("lang_b") && col("source") === col("source_b") &&
      col("len_band") === col("len_band_b") &&
      col("doc_a") < col("doc_b"))
  }

  def main(args: Array[String]): Unit = {
    val d = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
    // extra confs via env, applied at BUILDER time (static core confs
    // like shuffle compression are not settable post-start)
    sys.env.get("SPARK_GRAFT_LAB_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder0.config(k, v) })
    val spark = builder0
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST_THRESHOLD", "10m"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AQE_BROADCAST_THRESHOLD", "64m"))
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exps = experiments(spark, d)
    val todo = if (names.isEmpty || names == Seq("all")) exps.keys.toSeq.sorted else names
    todo.foreach { n =>
      val fn = exps(n)
      // collect(), not count(): count() column-prunes value
      // expressions (see QTime) — a count-timed probe of an aggregate
      // measures the grouping only, never the sums
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn().collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"LAB $n%-24s ${ts.min}%8.2f s  (${ts.map(t => f"$t%.2f").mkString(" ")})")
      // SPARK_GRAFT_LAB_SHOW=1: print the first rows (census probes).
      // take(10), never collect().take — a row-returning lane (e.g. the
      // fuzzy builtin census, millions of pairs) would materialize its
      // entire result on the driver first (r18, per advice)
      if (sys.env.contains("SPARK_GRAFT_LAB_SHOW"))
        fn().take(10).foreach(r => println(s"  ROW $n: $r"))
      // SPARK_GRAFT_LAB_METRICS=1: execute once more via collect() and
      // dump the final-AQE plan's node metrics (rows, timings, spills)
      if (sys.env.contains("SPARK_GRAFT_LAB_METRICS")) {
        val df = fn()
        df.collect()
        def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
          val interesting = p.metrics.filter { case (_, m) =>
            m.value > 0 && (m.metricType == "timing" || m.metricType == "nsTiming" ||
              m.name.exists(nm => nm.contains("rows") || nm.contains("spill") ||
                nm.contains("data size") || nm.contains("time")))
          }.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
          println("  " * depth + p.nodeName + (if (interesting.nonEmpty) s" [$interesting]" else ""))
          val kids = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              Seq(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
            case r: org.apache.spark.sql.execution.ReusedSubqueryExec => Seq(r.child)
            case b: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(b.child)
            case other => other.children
          }
          kids.foreach(walk(_, depth + 1))
        }
        walk(df.queryExecution.executedPlan, 1)
      }
    }
    spark.stop()
  }
}
