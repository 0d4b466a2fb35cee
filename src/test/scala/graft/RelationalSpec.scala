package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Smoke + shape tests for the relational surface (R1-R14, X1, X3).
  * Value-level correctness is gated by the DuckDB oracle
  * (tools/check_oracle.py / the driver's CORRECTNESS run); here we pin
  * schema and basic invariants at sf0.001 so regressions fail fast. */
class RelationalSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkTest.session

  test("every query has an oracle and runs at sf0.001") {
    assert(Relational.oracles.keySet == Relational.queries.keySet)
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      df.limit(1).collect() // plan executes
    }
  }

  test("r34 SCD2 builds through ONE hash exchange; intervals tile each user's history") {
    val df = Relational.r34(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // AQE's toString prints the Final AND Initial plans — count
    // exchanges in the final plan only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the change-flag window, interval-id sum, interval aggregate and
    // valid_to lead must all reuse ONE exchange on user_id (the final
    // presentation ORDER BY adds a range exchange, which is fine)
    val hashEx = "exchange hashpartitioning".r
      .findAllIn(plan.toLowerCase).length
    assert(hashEx == 1,
      s"r34 must shuffle exactly once, by hash on user_id:\n$plan")
    // intervals tile: per user, exactly one open interval (NULL
    // valid_to), and each valid_to equals the next interval's
    // valid_from
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, ivs) =>
      assert(ivs.count(_.isNullAt(3)) == 1, s"user $u: open intervals != 1")
      val sorted = ivs.sortBy(_.getString(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(3) == b.getString(2),
            s"user $u: valid_to gap between intervals")
        case _ =>
      }
    }
  }

  test("r35 incremental refresh ≡ from-scratch aggregate, groups merge exactly") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val inc = Relational.r35(spark, sf).collect()
    assert(inc.nonEmpty)
    // from-scratch reference: ONE aggregate over all orders — the
    // associativity of the partial states is what r35 must preserve
    val full = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(28, 6))).cast("double"), 4)
          .as("revenue"))
      .orderBy(col("o_orderstatus"), col("month"))
      .collect()
    assert(inc.length == full.length,
      s"group count drifted: incremental ${inc.length} vs full ${full.length}")
    inc.zip(full).foreach { case (i, f) =>
      assert(i.toSeq == f.toSeq, s"merge divergence: $i vs $f")
    }
    // the refresh batch must be non-trivial at this sf (else the merge
    // path isn't exercised) and some groups must exist in both splits
    val late = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 17 === 3).count()
    assert(late > 0, "empty delta — the refresh path is untested")
  }

  test("r37 RFM: segments partition the user base; quartiles balanced within 1") {
    import org.apache.spark.sql.functions._
    val rows = Relational.r37(spark, sf).collect()
    assert(rows.nonEmpty)
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head.getLong(0)
    // the segment lattice partitions the user base exactly
    assert(rows.map(_.getLong(3)).sum == nUsers)
    // every quartile label is in 1..4 and each metric's marginal is
    // balanced within 1 user (the rank0 * 4 DIV n rule's guarantee)
    for (qIdx <- 0 to 2) {
      val marginal = rows.groupBy(_.getLong(qIdx))
        .map { case (q, rs) => (q, rs.map(_.getLong(3)).sum) }
      assert(marginal.keySet.subsetOf(Set(1L, 2L, 3L, 4L)), s"col $qIdx: ${marginal.keySet}")
      val sizes = marginal.values
      assert(sizes.max - sizes.min <= 1,
        s"metric $qIdx quartiles unbalanced: $marginal")
    }
    // distributed rank ≡ a driver-side sort: recompute the recency
    // quartile marginal from the collected user frame
    val lastTs = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(max(col("ts")).as("last_ts"))
      .collect().map(r => (r.getTimestamp(1).getTime, r.getLong(0)))
    val refRq = lastTs.sortBy { case (t, u) => (-t, u) }.zipWithIndex
      .map { case (_, r) => r.toLong * 4 / nUsers + 1 }
      .groupBy(identity).map { case (q, xs) => (q, xs.length.toLong) }
    val gotRq = rows.groupBy(_.getLong(0))
      .map { case (q, rs) => (q, rs.map(_.getLong(3)).sum) }
    assert(gotRq == refRq, s"recency marginal drift: $gotRq vs $refRq")
  }

  test("x22 snapshot diff: document text never enters an exchange") {
    import graft.operators.Corpus
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = Corpus.x22SnapshotDiff(spark, sf)
    df.collect()
    def allEx(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allEx(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allEx(q.plan)
        case x: ShuffleExchangeExec => x +: x.children.flatMap(allEx)
        case other => other.children.flatMap(allEx)
      }
    val exchanges = allEx(df.queryExecution.executedPlan)
    assert(exchanges.nonEmpty, "expected the diff join to shuffle the slim projections")
    exchanges.foreach { x =>
      assert(!x.output.map(_.name).contains("text"),
        s"document text shuffled — the slim (id, source, md5, ntok) projection was lost:\n$x")
    }
  }

  test("x23 drift: tv in [0,10000] bp, top term bounded by total, vocab ≤ tokens") {
    import graft.operators.Corpus
    val rows = Corpus.x23DistributionDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ntO, ntN) = (r.getAs[Long]("n_tok_old"), r.getAs[Long]("n_tok_new"))
      val (vO, vN) = (r.getAs[Long]("vocab_old"), r.getAs[Long]("vocab_new"))
      val tv = r.getAs[Long]("tv_bp"); val top = r.getAs[Long]("top_word_bp")
      assert(tv >= 0 && tv <= 10000, s"tv_bp out of range: $r")
      // the top term's contribution can never exceed the whole distance
      assert(top >= 0 && top <= tv, s"top_word_bp > tv_bp: $r")
      assert(vO <= ntO && vN <= ntN && vO > 0 && vN > 0, s"vocab/token inversion: $r")
      // the revision injects ' rev2' into every doc_id % 5 == 0 doc, so
      // every source must show SOME drift at this sf
      assert(tv > 0, s"zero drift despite the rev2 injection: $r")
    }
  }

  test("x23 decimal lane: forced threshold switches the plan, answers bit-held") {
    import graft.operators.Corpus
    // long lane (production default at gate scale) vs forced DECIMAL
    // lane: the switch must move arithmetic width only, never a value
    val longLane = Corpus.x23DistributionDriftImpl(spark, sf, Long.MaxValue)
    val wideLane = Corpus.x23DistributionDriftImpl(spark, sf, 0L)
    val longPlan = longLane.queryExecution.optimizedPlan.toString
    val widePlan = wideLane.queryExecution.optimizedPlan.toString
    assert(!longPlan.toLowerCase.contains("decimal("),
      s"long lane leaked decimal arithmetic:\n$longPlan")
    assert(widePlan.toLowerCase.contains("as decimal(19,0)"),
      s"forced decimal lane shows no widened cross products:\n$widePlan")
    val a = longLane.collect().map(_.toSeq)
    val b = wideLane.collect().map(_.toSeq)
    assert(a.sameElements(b),
      "decimal-lane x23 diverged from the long lane at gate scale")
  }

  test("x27 batching: conserves docs and tokens; batch spans ordered within a bucket; " +
    "waste bounded") {
    import org.apache.spark.sql.functions._
    import graft.operators.Corpus
    val rows = Corpus.x27LengthBatching(spark, sf).collect()
    assert(rows.nonEmpty)
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select(count(lit(1)), sum(size(split(col("text"), " ")).cast("long"))).head
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus.getLong(0),
      "batching lost or duplicated documents")
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == corpus.getLong(1),
      "batching lost or duplicated tokens")
    rows.foreach { r =>
      val w = r.getAs[Long]("pad_waste_bp")
      assert(w >= 0 && w < 10000, s"pad waste out of range: $r")
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"), s"span inverted: $r")
    }
    // within a bucket, batches fill in doc_id order: batch k's span ends
    // before batch k+1's begins, and batch ids are dense from 0
    rows.groupBy(_.getAs[Long]("bucket")).foreach { case (bkt, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("batch_id"))
      // batch 0 always exists (first doc's exclusive prefix is 0) and
      // ids strictly increase; ids may legitimately skip when a single
      // doc exceeds the budget, so density is not asserted
      assert(sorted.head.getAs[Long]("batch_id") == 0L, s"bucket $bkt has no batch 0")
      sorted.map(_.getAs[Long]("batch_id")).sliding(2).foreach {
        case Array(a, b) => assert(a < b, s"bucket $bkt duplicate batch id")
        case _ =>
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
            s"bucket $bkt: batch spans overlap or disorder")
        case _ =>
      }
    }
  }

  test("x28 report: one row per eligible eval doc; bounded fractions; " +
    "consistent with x12's training-side view") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val rows = Dedup.x28ContaminationReport(spark, sf).collect()
    val eligible = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 50 === 0 && size(split(col("text"), " ")) >= 8)
      .count()
    assert(rows.length == eligible.toInt,
      s"expected a row per eligible eval doc ($eligible), got ${rows.length}")
    rows.foreach { r =>
      val (ng, nc) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_contaminated"))
      val bp = r.getAs[Long]("contamination_bp")
      assert(nc <= ng && ng > 0, s"contaminated grams exceed total: $r")
      assert(bp >= 0 && bp <= 10000, s"bp out of range: $r")
      assert(r.getAs[Boolean]("flagged") == (bp >= 2000), s"flag/threshold drift: $r")
    }
    // duality with x12: training docs carry eval text iff some eval doc
    // shows contamination
    val x12Hit = Dedup.x12Decontaminate(spark, sf).count() > 0
    val x28Hit = rows.exists(_.getAs[Long]("n_contaminated") > 0)
    assert(x12Hit == x28Hit, "x12 and x28 disagree about contamination existing")
  }

  test("r02 aggregate shape") {
    val rows = Relational.r02(spark, sf).collect()
    assert(rows.length >= 4 && rows.length <= 6) // flag x status combos
    assert(rows.map(_.getLong(2)).sum == 6000L)  // n_rows covers lineitem
  }

  test("r09 window emits at most 3 rows per customer") {
    val rows = Relational.r09(spark, sf).collect()
    val perCust = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(perCust.forall(_ <= 3))
    assert(rows.forall(_.getInt(3) <= 3))
  }

  test("r11 top-k is sorted desc with unique keys") {
    val rows = Relational.r11(spark, sf).collect()
    assert(rows.length == 20)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("x1 dedup keeps lowest doc_id per content hash") {
    val kept = Relational.x1(spark, sf).collect().map(_.getLong(0)).toSet
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(kept.size <= total && kept.nonEmpty)
  }

  test("r38 validation: clean corpus measures zero violations; " +
    "seeded corruption is caught check-by-check") {
    import org.apache.spark.sql.functions._
    val clean = Relational.r38(spark, sf).collect()
    assert(clean.length == 11, s"check suite size drifted: ${clean.length}")
    val liN = graft.sources.Tables.lineitem(spark, sf).count()
    clean.foreach { r =>
      assert(r.getAs[Boolean]("pass") && r.getAs[Long]("violations") == 0L,
        s"clean data flagged: $r")
    }
    assert(clean.filter(_.getString(0) == "lineitem")
      .forall(_.getAs[Long]("n_rows") == liN), "lineitem row count drifted")

    // seeded-corruption replay: copy the three tables, inject exactly
    // one violation per check class (each bad row is engineered to trip
    // ONLY its own check), re-run the identical suite
    val work = java.nio.file.Files.createTempDirectory("r38spec").toFile
    try {
      val li = graft.sources.Tables.lineitem(spark, sf)
      val ord = graft.sources.Tables.orders(spark, sf)
      val cust = graft.sources.Tables.customer(spark, sf)
      li.union(li.limit(2).withColumn("l_quantity", lit(99.0)))     // 2× range
        .union(li.limit(1).withColumn("l_orderkey", lit(-1L)))      // 1× orphan
        .union(li.limit(1).withColumn("l_orderkey",
          lit(null).cast("long")))                                  // 1× NULL-FK orphan
        .write.parquet(s"${work.getAbsolutePath}/lineitem.parquet")
      ord.union(ord.limit(1).withColumn("o_orderkey", lit(-2L))
          .withColumn("o_orderstatus", lit("X")))                   // 1× domain
        .union(ord.limit(1).withColumn("o_orderkey", lit(-3L))
          .withColumn("o_custkey", lit(-5L)))                       // 1× orphan
        .union(ord.limit(1).withColumn("o_orderkey", lit(-8L))
          .withColumn("o_custkey", lit(null).cast("long")))         // 1× NULL-FK orphan
        .union(ord.limit(1))                                        // 1× dup key
        .write.parquet(s"${work.getAbsolutePath}/orders.parquet")
      cust.union(cust.limit(1))                                     // 1× dup key
        .union(cust.limit(1).withColumn("c_custkey", lit(-7L))
          .withColumn("c_name", lit(null).cast("string")))          // 1× null name
        .write.parquet(s"${work.getAbsolutePath}/customer.parquet")

      val got = Relational.r38(spark, work.getAbsolutePath).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Long]("violations"), r.getAs[Boolean]("pass"))).toMap
      val expected = Map(
        ("lineitem", "quantity_range") -> (2L, false),
        ("lineitem", "discount_range") -> (0L, true),
        ("lineitem", "price_positive") -> (0L, true),
        ("lineitem", "ri_orderkey") -> (2L, false),
        ("orders", "status_domain") -> (1L, false),
        ("orders", "price_positive") -> (0L, true),
        ("orders", "orderkey_unique") -> (1L, false),
        ("orders", "ri_custkey") -> (2L, false),
        ("customer", "custkey_unique") -> (1L, false),
        ("customer", "name_not_null") -> (1L, false),
        ("customer", "segment_not_null") -> (0L, true))
      assert(got == expected,
        s"corruption not isolated per check:\n got=$got\n exp=$expected")
      // the forced bloom lane must catch the SAME orphans: definite
      // (bloom-rejected, including the NULL FKs a bare !probe/probe
      // pair would drop from both branches) + residual (false-positive
      // survivors) sums to the exact anti-join count
      val gotBloom = Relational.r38Impl(spark, work.getAbsolutePath, 0L).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Long]("violations"), r.getAs[Boolean]("pass"))).toMap
      assert(gotBloom == expected,
        s"bloom-lane RI diverged under corruption:\n got=$gotBloom\n exp=$expected")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(work)
    }
  }

  test("r38 bloom lane: forced threshold puts the bloom probe on the fact scan, " +
    "no broadcast residual, report bit-held") {
    import graft.operators.Relational
    val default = Relational.r38(spark, sf)
    val forced = Relational.r38Impl(spark, sf, 0L)
    val defPlan = default.queryExecution.executedPlan.toString
    val bloomPlan = forced.queryExecution.executedPlan.toString
    assert(!defPlan.contains("might_contain"),
      s"gate lane leaked a bloom probe:\n$defPlan")
    assert(bloomPlan.contains("might_contain"),
      s"forced lane shows no bloom probe on the fact scan:\n$bloomPlan")
    assert(!bloomPlan.contains("BroadcastHashJoin LeftAnti"),
      s"forced lane still broadcasts the residual anti join:\n$bloomPlan")
    assert(forced.collect().map(_.toSeq)
        .sameElements(default.collect().map(_.toSeq)),
      "bloom-lane r38 diverged from the broadcast lane")
  }

  test("r39 cohort retention: offset-0 rows are full cohorts, sizes partition " +
    "the user base, retention bounded") {
    import graft.operators.Relational
    import org.apache.spark.sql.functions.col
    val rows = Relational.r39(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (cohort, rs) =>
      // week 0 contains every cohort member by construction (the first
      // event IS activity in the cohort week)
      val w0 = rs.find(_.getAs[Long]("week_offset") == 0L)
      assert(w0.isDefined, s"cohort $cohort lost its week-0 row")
      assert(w0.get.getAs[Long]("n_active") == w0.get.getAs[Long]("cohort_size") &&
        w0.get.getAs[Long]("retention_bp") == 10000L,
        s"cohort $cohort week-0 is not the full cohort: ${w0.get}")
      rs.foreach { r =>
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size") &&
          r.getAs[Long]("retention_bp") <= 10000L &&
          r.getAs[Long]("week_offset") >= 0L, s"retention inversion: $r")
      }
    }
    // cohort sizes partition the user base exactly
    val users = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val sizeSum = byCohort.values
      .map(_.head.getAs[Long]("cohort_size")).sum
    assert(sizeSum == users,
      s"cohort sizes ($sizeSum) do not partition the $users users")
  }

  test("r40 lane pick: both join lanes answer identically; the picked lane " +
    "matches the form-count bound") {
    import graft.operators.Relational
    val hash = Relational.r40Impl(spark, sf, Some("shuffle_hash"))
    val merge = Relational.r40Impl(spark, sf, Some("merge"))
    assert(hash.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
      "forced shuffle_hash lane did not plan a ShuffledHashJoin")
    assert(merge.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
      "forced merge lane did not plan a SortMergeJoin")
    assert(hash.collect().map(_.toSeq).toSeq == merge.collect().map(_.toSeq).toSeq,
      "the two join lanes disagree — the lane pick would change answers")
    // the one-shuffle grouped expansion must answer identically too
    val grouped = Relational.r40Impl(spark, sf, Some("grouped"))
    assert(grouped.collect().map(_.toSeq).toSeq
      == hash.collect().map(_.toSeq).toSeq,
      "grouped pair expansion diverged from the join lanes")
    // at gate scale the bound sits far under the per-partition bytes
    // ceiling ⇒ the unforced pick must take the measured-faster hash lane
    assert(Relational.r40(spark, sf).queryExecution.executedPlan.toString
      .contains("ShuffledHashJoin"),
      "gate-scale pick should be shuffle_hash (forms far below the ceiling)")
  }

  test("r40 lane ceiling self-tunes to key width: long keys flip to merge " +
    "where the old rows/partition constant would have built an OOM-sized map") {
    import graft.operators.Relational
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // 16 names of 500 chars: 16 · (2·500²+1) = 8M forms — the retired
    // 1M-rows/partition rule said shuffle_hash at 8 partitions, but the
    // build side is 16 · 500001 · (2·500+96) ≈ 8.8 GB ≫ parts·96 MB
    val longKeys = (0 until 16).map(i => ("x" * 499) + ('a' + i).toChar)
      .toDF("name")
    assert(Relational.r40PickLane(longKeys, parts) == "grouped",
      "500-char keys must flip off the hash lane (bytes, not rows)")
    // typical key width at a count far below the ceiling stays hash
    val shortKeys = (0 until 1000).map(i => f"Customer#$i%09d").toDF("name")
    assert(Relational.r40PickLane(shortKeys, parts) == "shuffle_hash",
      "gate-shaped short keys must keep the measured-faster hash lane")
    // empty frame: sum() is NULL — must coalesce to 0, not NPE
    assert(Relational.r40PickLane(Seq.empty[String].toDF("name"), parts)
      == "shuffle_hash", "empty name frame must not NPE in the lane probe")
  }

  test("r40 grouped lane: a degenerate identical-key group past the cap " +
    "DEGRADES through the spilling merge lane and still answers exactly") {
    import graft.operators.Relational
    import spark.implicits._
    // ten rows sharing ONE form (quadratic output for any exact fuzzy
    // join) plus a well-blocked form — the pre-count must route ONLY
    // the oversized form through the sort-merge join and union it with
    // the grouped expansion of the rest
    val vars = ((0 until 10).map(i => ("sameform", s"name$i", 0, 0)) ++
      Seq(("okform", "alpha", 0, 0), ("okform", "beta", 1, 0)))
      .toDF("form", "name", "d", "w")
    val deg = Relational.r40GroupedPairs(spark, vars, GroupCap = 8)
    assert(deg.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
      "the oversized-form fallback must take the spilling sort-merge lane")
    assert(deg.count() == 45L + 1L,
      "fallback union must answer C(10,2) degenerate pairs + 1 normal pair")
    // at-or-below the cap the same frame answers through the grouped
    // expansion alone — a group of EXACTLY GroupCap rows is within
    // bounds, not a breach, and no pre-count runs when the caller's
    // formsBound proves the whole frame fits the cap
    val fit = Relational.r40GroupedPairs(spark, vars, formsBound = 12,
      GroupCap = 12)
    assert(!fit.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    assert(fit.count() == 46L)
    assert(Relational.r40GroupedPairs(spark, vars, GroupCap = 1024)
      .count() == 46L)
    // the defensive in-expansion cap stays LOUD: a caller-supplied
    // formsBound that falsely promises the frame fits the cap breaches
    // the pre-count contract and must throw, not OOM
    val boom = intercept[org.apache.spark.SparkException] {
      Relational.r40GroupedPairs(spark, vars, formsBound = 8, GroupCap = 8)
        .collect()
    }
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) t.getMessage else rootMsg(t.getCause)
    assert(rootMsg(boom).contains("exceeds 8 rows"),
      s"expected the group-cap contract error, got: ${rootMsg(boom)}")
  }

  test("r40 fuzzy join: k=2 deletion-neighborhood blocking finds EXACTLY " +
    "the brute-force lev<=2 pairs; no cartesian in the plan") {
    import graft.operators.Relational
    val df = Relational.r40(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join fell back to an all-pairs plan:\n$plan")
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // driver-side brute force: the O(n^2) DP the blocking must equal
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val names = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_name").collect().map(_.getString(0)).sorted
    val want = (for {
      i <- names.indices; j <- (i + 1) until names.length
      d = lev(names(i), names(j)) if d <= 2
    } yield (names(i), names(j), d)).toSet
    assert(got == want,
      s"missed=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "degenerate fixture: no fuzzy pairs at sf0.001")
  }

  test("r40 canonical-witness prune: the distinct pair set is unchanged " +
    "and still equals brute-force lev<=2, on adversarial corpora") {
    import graft.operators.Relational
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    // driver-side replica of the blocking: admitted pairs per form
    // group, with and without the canonical prune
    def pairs(names: Seq[String], canonical: Boolean): Set[(String, String)] = {
      val rows = names.flatMap(n => Relational.levForms(n).toSeq)
      rows.groupBy(_._1).values.flatMap { g =>
        for {
          (f, na, da, wa) <- g
          (_, nb, db, wb) <- g
          if na < nb && da + db + math.max(wa, wb) <= 2 &&
            (!canonical ||
              Relational.r40CanonicalKeep(f, na, da, wa, nb, db, wb))
        } yield (na, nb)
      }.toSet
    }
    def check(names: Seq[String]): Unit = {
      val full = pairs(names, canonical = false)
      val pruned = pairs(names, canonical = true)
      assert(pruned == full,
        s"canonical prune changed the pair set on $names: " +
          s"lost=${(full -- pruned).take(5)} " +
          s"gained=${(pruned -- full).take(5)}")
      val brute = (for {
        a <- names; b <- names if a < b && lev(a, b) <= 2
      } yield (a, b)).toSet
      assert(pruned == brute,
        s"blocking drifted from brute force on $names: " +
          s"missed=${(brute -- pruned).take(5)} " +
          s"extra=${(pruned -- brute).take(5)}")
    }
    // periodic strings (double del-del witnesses), runs, indels,
    // serial-id shapes, reserved-wildcard-bearing names (generic path)
    check(Seq("ababa", "babab", "abab", "aabb", "abba", "aaaa", "aaab"))
    check(Seq("Customer#001", "Customer#002", "Customer#011",
      "Customer#101", "Customer#110", "Customer#012"))
    check(Seq("a", "", "ab", "ba", "abc", "acb", "bac", "ca", "b"))
    check(Seq("mississippi", "mississippix", "missisippi", "mississipi",
      "mizsissippi"))
    check(Seq("x\u0001y", "xy", "xzy", "x\u0001\u0001", "xzzy"))
    // randomized small-alphabet sweep — short strings over {a,b,c}
    // maximize run/periodic/indel collisions; deterministic seed
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 60) {
      val names = (0 until 12).map(_ =>
        Array.fill(rnd.nextInt(8))(('a' + rnd.nextInt(3)).toChar).mkString)
        .distinct
      check(names)
    }
  }

  test("r40 levForms fast emission is set-identical to the generic " +
    "LinkedHashSet enumeration on adversarial shapes") {
    import graft.operators.Relational
    // run-heavy, periodic, short, empty, single-char, all-equal,
    // reserved-wildcard-bearing (falls back to the generic path), and
    // the gate's serial-id shape
    val names = Seq(
      "", "a", "aa", "ab", "aaa", "aba", "abab", "ababa", "aabba",
      "aaaaaaaa", "abcabcabc", "xxaayyzz", "Customer#000000001",
      "Customer#000001999", "a\u0001b", "\u0001", "\u0001\u0001a",
      "mississippi", "zzzyzzz")
    for (n <- names) {
      val fast = Relational.levForms(n).toSet
      val gen = Relational.levFormsGeneric(n).toSet
      assert(fast == gen,
        s"levForms('$n') diverged: missing=${(gen -- fast).take(5)} " +
          s"extra=${(fast -- gen).take(5)}")
    }
    // randomized sweep over a small alphabet (maximizes run/periodic
    // collisions) — deterministic seed, failures name the culprit
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 300) {
      val len = rnd.nextInt(12)
      val n = Array.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString
      val fast = Relational.levForms(n).toSet
      val gen = Relational.levFormsGeneric(n).toSet
      assert(fast == gen,
        s"levForms('$n') diverged: missing=${(gen -- fast).take(5)} " +
          s"extra=${(fast -- gen).take(5)}")
    }
  }

  test("t18 novelty: distributed gram fold matches a driver-side recompute exactly") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.t18NgramNovelty(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"),
          r.getAs[Long]("novelty_bp"))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // same tokenization as the engine: split on single space, keep
    // empties (Spark's split has no limit → trailing empties retained)
    val gramsOf = docs.map { case (id, t) =>
      val w = t.split(" ", -1)
      id -> (if (w.length >= 8) w.sliding(8).map(_.mkString(" ")).toSet
             else Set.empty[String])
    }.toMap
    val df = scala.collection.mutable.Map.empty[String, Int]
    gramsOf.values.foreach(_.foreach(g => df(g) = df.getOrElse(g, 0) + 1))
    val ref = gramsOf.collect { case (id, gs) if gs.nonEmpty =>
      val n = gs.size.toLong
      val shared = gs.count(df(_) >= 2).toLong
      id -> (n, shared, (n - shared) * 10000L / n)
    }
    assert(rows == ref, {
      val diff = (ref.keySet ++ rows.keySet)
        .filter(k => ref.get(k) != rows.get(k)).take(5)
      s"novelty drift on docs $diff: got ${diff.map(rows.get)}, want ${diff.map(ref.get)}"
    })
    rows.values.foreach { case (n, sh, bp) =>
      assert(sh <= n && bp >= 0 && bp <= 10000, s"bounds violated: ($n, $sh, $bp)")
    }
  }
}
