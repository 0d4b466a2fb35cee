package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Relational, TextAnalysis}
import graft.matrix.MatrixQueries
import graft.streaming.Streaming

/** Specs for the round-1 extension batch (r17-r20, p5, t5-t6, st4, m7).
  * The DuckDB gate hash-checks values at sf0.01; these specs assert the
  * SEMANTIC contracts the oracle can't see — that the scale-shaped
  * implementations (binned interval join, union+window as-of, label
  * propagation) equal their naive definitions, computed independently
  * here per-row on the driver. */
class ExtendedOpsSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkTest.session

  test("prefixSum (x14/x16 scan) is exact and input-partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val data = (0L until 5000L).map(i => (i, rnd.nextInt(100).toLong))
    val expected = data.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, pv, pStart), (id, v)) => (id, v, pStart + pv) }
      .drop(1).map { case (id, v, pre) => (id, v) -> pre }.toMap
    // shuffled arrival order + three different input partitionings: the
    // range partition inside prefixSum must normalize them all
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.createDataFrame(rnd.shuffle(data)).toDF("id", "v")
        .repartition(parts)
      val got = graft.operators.Corpus.prefixSum(df, Seq(col("id")), "v")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expected, s"prefix mismatch at input partitioning $parts")
    }
  }

  test("property: x27's distributed batching ≡ a driver-side reference on random corpora") {
    import spark.implicits._
    // randomized doc-length corpora (incl. docs larger than the budget,
    // which skip batch ids); the distributed two-phase-scan batching
    // must equal the obvious sequential per-bucket fold computed here
    val rnd = new scala.util.Random(0xBA7C)
    for (trial <- 0 until 3) {
      val docs = (0L until (500L + trial * 700L)).map { id =>
        val ntok = 1 + (rnd.nextInt(3) match {
          case 0 => rnd.nextInt(30)          // short
          case 1 => 30 + rnd.nextInt(200)    // medium
          case _ => 400 + rnd.nextInt(800)   // can exceed the 512 budget
        })
        (id, Seq.fill(ntok)("w").mkString(" "))
      }
      val df = spark.createDataFrame(rnd.shuffle(docs)).toDF("doc_id", "text")
        .repartition(5)
      // reference: per bucket in doc_id order, batch = exclusive-prefix DIV 512
      val ref = docs.map { case (id, t) => (id, t.split(" ").length.toLong) }
        .map { case (id, n) => (n / 16, id, n) }
        .groupBy(_._1).flatMap { case (bkt, ds) =>
          var pref = 0L
          ds.sortBy(_._2).map { case (_, id, n) =>
            val b = pref / 512; pref += n; (bkt, b, id, n)
          }
        }
        .groupBy(t => (t._1, t._2)).map { case ((bkt, b), xs) =>
          (bkt, b, xs.size.toLong, xs.map(_._4).sum,
            xs.map(_._3).min, xs.map(_._3).max, xs.map(_._4).max)
        }
        .map { case (bkt, b, nd, nt, fd, ld, mx) =>
          Seq(bkt, b, nd, nt, fd, ld, (nd * mx - nt) * 10000 / (nd * mx))
        }.toSet
      val viaTables = new java.io.File(s"/tmp/graft-x27-prop-$trial")
      df.write.mode("overwrite").parquet(viaTables.getAbsolutePath + "/documents.parquet")
      val got = graft.operators.Corpus.x27LengthBatching(spark, viaTables.getAbsolutePath)
        .collect().map(_.toSeq.map(_.asInstanceOf[Long]): Seq[Long]).toSet
      assert(got == ref, s"trial $trial: distributed batching diverged from reference")
    }
  }

  test("r32 native session_window agrees with st2's hand-rolled sessionizer") {
    import java.sql.Timestamp
    // the two differ ONLY on gaps of exactly 30 minutes (half-open
    // session_window vs st2's strict >); confirm none exist, then the
    // per-user session counts and event totals must match exactly
    val evs = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getAs[Timestamp](1).getTime))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val boundaryGaps = evs.values.flatMap(ts =>
      ts.zip(ts.drop(1)).map { case (a, b) => b - a }).count(_ == 30L * 60 * 1000)
    assert(boundaryGaps == 0, s"$boundaryGaps exact 30-min gaps — conventions diverge")
    val r32 = Relational.r32(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(rs => (rs.length, rs.map(_.getAs[Int]("n_events")).sum)).toMap
    val st2 = Streaming.st2Sessionize(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(rs => (rs.length, rs.map(_.getAs[Int]("n_events")).sum)).toMap
    assert(r32 == st2, "session counts/totals diverged between the two sessionizers")
  }

  test("r19 as-of join equals the naive per-purchase scan") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 + r.getTimestamp(1).getNanos / 1000 % 1000,
        r.getLong(2), r.getString(3), r.getDouble(4)))
    val clicks = ev.filter(_._4 == "click")
    val expected = ev.filter(_._4 == "purchase").map { case (pid, pts, uid, _, _) =>
      val prior = clicks.filter(c => c._3 == uid && c._2 <= pts)
      val best = if (prior.isEmpty) None
        else Some(prior.maxBy(c => (c._2, c._1))._5)
      (pid, best)
    }.toMap
    val got = Relational.r19(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got == expected)
  }

  test("r20 binned interval join equals the naive theta join") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val naive = ev.as("a").join(ev.as("b"),
        col("b.us") >= col("a.us") && col("b.us") - col("a.us") < 300000000L &&
          (col("b.us") > col("a.us") || col("a.event_id") < col("b.event_id")))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("type_a"), col("type_b"))
      .collect().map(_.toSeq)
    val got = Relational.r20(spark, sf).collect().map(_.toSeq)
    assert(got.sameElements(naive))
  }

  test("p5 clusters: pair-connected docs share a cluster; representatives are minima") {
    val pairs = Dedup.p1MinHashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.p5DupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // the representative is a member of its own cluster and is the minimum
    clusters.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.keySet.min == rep, s"cluster $rep not labeled by its min member")
    }
    // docs not in any pair are singletons
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.foreach { case (doc, rep) =>
      if (!paired.contains(doc)) assert(rep == doc, s"unpaired doc $doc got relabeled")
    }
  }

  test("t6 sampling is deterministic and stratified by the configured rates") {
    val s1 = TextAnalysis.t6StratifiedSample(spark, sf).collect().map(_.getLong(0))
    val s2 = TextAnalysis.t6StratifiedSample(spark, sf).collect().map(_.getLong(0))
    assert(s1.sameElements(s2), "hash sampling must be run-stable")
    val total = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextAnalysis.t6StratifiedSample(spark, sf)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 buckets are uniform; allow wide slack at this tiny sf
    total.foreach { case (lang, n) =>
      val rate = lang match { case "en" => 0.10; case "zh" => 0.40; case _ => 0.25 }
      val k = kept.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(k - rate) < 0.25, f"$lang kept $k%.2f, expected ≈$rate")
    }
  }

  test("st4 streaming dedup equals batch distinct") {
    val got = Streaming.st4StreamDedup(spark, sf).collect().map(_.toSeq)
    val batch = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .distinct()
      .orderBy(col("user_id"), col("event_type"), col("day"))
      .collect().map(_.toSeq)
    assert(got.sameElements(batch))
  }

  test("m7 determinant: distributed log-det matches independent local LU") {
    val row = MatrixQueries.m7Determinant(spark, sf).collect().head
    assert(row.getAs[Boolean]("pass"),
      s"det mismatch: logabs=${row.getAs[Double]("logabs_det")} sign=${row.getAs[Int]("sign")}")
  }

  test("st5 stream-stream join equals the batch join") {
    val got = Streaming.st5StreamStreamJoin(spark, sf).collect().map(_.toSeq)
    val ev = graft.sources.Tables.events(spark, sf)
    val batch = ev.filter(col("event_type") === "purchase").as("p")
      .join(ev.filter(col("event_type") === "click").as("c"),
        col("c.user_id") === col("p.user_id") &&
          col("c.ts") <= col("p.ts") &&
          col("c.ts") > col("p.ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("p.event_id").as("purchase_id"), col("c.event_id").as("click_id"),
        col("p.user_id").as("user_id"))
      .orderBy(col("purchase_id"), col("click_id"))
      .collect().map(_.toSeq)
    assert(got.sameElements(batch))
  }

  test("x4 centroids: every label has all 64 dims, means bounded, counts constant per label") {
    val rows = graft.operators.Similarity.x4Centroids(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (label, dims) =>
      assert(dims.map(_._2).sorted.sameElements(1 to 64), s"label $label missing dims")
      assert(dims.map(_._3).distinct.length == 1, s"label $label inconsistent n_vecs")
    }
    assert(rows.forall(r => math.abs(r._4) <= 1.0))
  }

  test("r21 range frame equals the naive per-row 1h-window sum") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = ev.map { case (eid, uid, us, _) =>
      val sum = ev.filter(e => e._2 == uid && e._3 <= us && e._3 >= us - 3600000000L)
        .map(e => BigDecimal(e._4)).sum
      (eid, sum.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = Relational.r21(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got == expected)
  }

  test("r30 bloom-filtered join equals the plain semi-join") {
    val plain = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = Relational.r30(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == plain)
  }

  test("x7 exact counts match a driver-local count; sketch bounds hold") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val counts = docs.flatMap(_.toLowerCase.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    val got = TextAnalysis.x7HeavyHitters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.map(g => (g._1, g._2)).toSeq == expected)
    got.foreach { g =>
      assert(g._3, s"CMS undercounted '${g._1}' — impossible for a correct CMS")
      assert(g._4, s"CMS overcounted '${g._1}' past eps bound")
    }
  }

  test("p6 incremental dedup equals the naive new-vs-old brute force") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.trim))
    def grams(t: String): Set[String] = if (t.isEmpty) Set("") else t.sliding(8).toSet
    val (newD, oldD) = docs.partition(_._1 % 5 == 4)
    val expected = newD.map { case (nid, nt) =>
      val ng = grams(nt)
      val hits = oldD.filter { case (_, ot) =>
        val og = grams(ot)
        val inter = (ng & og).size
        5L * inter >= 3L * (ng.size + og.size - inter)
      }.map(_._1)
      (nid, (hits.length.toLong, if (hits.isEmpty) -1L else hits.min))
    }.toMap
    val got = Dedup.p6IncrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("x8 quantization matches a driver-local requantize; int8 range; bound holds") {
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val expected = vecs.map { case (id, v) =>
      val d = v.map(_.toDouble)
      val scale = d.map(math.abs).max
      // HALF_UP away from zero — the tie behavior Spark's round() and
      // DuckDB's ROUND() share (Math.round would differ on negative ties)
      val q = d.map(x => if (scale == 0) 0L
        else BigDecimal(x / scale * 127).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      assert(q.forall(qi => math.abs(qi) <= 127), s"vec $id out of int8 range")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(q.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (id, (scale, hash))
    }.toMap
    val got = graft.operators.Similarity.x8Quantize(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getString(2), r.getBoolean(3))))
    got.foreach { case (id, (scale, hash, ok)) =>
      assert(expected(id)._1 == scale, s"vec $id scale")
      assert(expected(id)._2 == hash, s"vec $id quantized values differ")
      assert(ok, s"vec $id reconstruction bound violated")
    }
    assert(got.length == expected.size)
  }

  test("r17 pivot covers every priority and has no null cells") {
    val df = Relational.r17(spark, sf)
    assert(df.columns.toSet == Set("o_orderstatus", "rev_urgent", "rev_high",
      "rev_medium", "rev_notspec", "rev_low"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => (1 until 6).foreach(i => assert(!r.isNullAt(i))))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("x11 passage dedup equals a naive driver-side first-occurrence pass") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val w = 16
    val passages = docs.map { case (id, text) =>
      val words = text.split(" ", -1)
      id -> words.grouped(w).map(_.mkString(" ")).toVector
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = passages.map { case (id, ps) =>
      val kept = ps.filter(p => seen.add(p))   // in (doc_id, pos) order
      id -> ((ps.size.toLong, kept.size.toLong, md5Hex(kept.mkString(" "))))
    }.toMap
    val got = Dedup.x11PassageDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected)
    // the corpus really exercises the operator: something must be dropped
    assert(got.values.map(_._2).sum < got.values.map(_._1).sum)
  }

  test("x30 exact-substring dedup equals an independent suffix-array+LCP " +
    "reference on overlapping, shifted, nested and within-doc repeats") {
    import spark.implicits._
    val k = 4
    def toks(s: String): Vector[String] = s.split(" ", -1).toVector
    // the repeat shapes the k-gram identity must survive: a shifted
    // copy at an arbitrary offset (doc 1), nested overlapping copies
    // (doc 2), a within-doc repeat (doc 3), an exact whole-doc dup
    // (doc 4), a sub-k doc (doc 5), a shifted-by-one prefix copy (doc 6)
    val docs: Seq[(Long, String)] = Seq(
      0L -> (1 to 30).map(i => s"a$i").mkString(" "),
      1L -> ("f1 f2 f3 " + (7 to 18).map(i => s"a$i").mkString(" ") + " f4 f5"),
      2L -> ("g1 g2 " + (10 to 22).map(i => s"a$i").mkString(" ") + " g3 " +
        (12 to 16).map(i => s"a$i").mkString(" ") + " g4"),
      3L -> "h1 h2 X1 X2 X3 X4 X5 h3 X1 X2 X3 X4 X5 h4",
      4L -> ("f1 f2 f3 " + (7 to 18).map(i => s"a$i").mkString(" ") + " f4 f5"),
      5L -> "s1 s2",
      6L -> ("z0 " + (1 to 16).map(i => s"a$i").mkString(" ")))
    // ---- independent reference: global suffix array + LCP ----
    val global = scala.collection.mutable.ArrayBuffer.empty[String]
    val owner = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    docs.foreach { case (id, text) =>
      toks(text).zipWithIndex.foreach { case (t, i) =>
        global += t; owner += ((id, i))
      }
      // unique sentinel: no k-window can straddle a document boundary
      global += s" sent$id"; owner += ((-1L, -1))
    }
    val n = global.length
    def less(i: Int, j: Int): Boolean = {
      var a = i; var b = j
      while (a < n && b < n) {
        val c = global(a).compareTo(global(b))
        if (c != 0) return c < 0
        a += 1; b += 1
      }
      a == n && b < n
    }
    val sa = (0 until n).sortWith(less)
    def lcp(i: Int, j: Int): Int = {
      var l = 0
      while (i + l < n && j + l < n && global(i + l) == global(j + l)) l += 1
      l
    }
    val lcpArr = (1 until n).map(r => lcp(sa(r - 1), sa(r)))
    // maximal SA runs with consecutive LCP ≥ k = the repeated k-grams;
    // every occurrence except the corpus-first covers its k tokens
    val covered = scala.collection.mutable.Set.empty[(Long, Int)]
    var r = 0
    while (r < n) {
      var e = r
      while (e < n - 1 && lcpArr(e) >= k) e += 1
      if (e > r) {
        val occ = (r to e).map(q => owner(sa(q)))
        val first = occ.min
        occ.filter(_ != first).foreach { case (dId, p) =>
          (p until p + k).foreach(t => covered += ((dId, t)))
        }
      }
      r = e + 1
    }
    val expected = docs.map { case (id, text) =>
      val ws = toks(text)
      val kept = ws.zipWithIndex.collect {
        case (t, i) if !covered((id, i)) => t
      }
      id -> ((ws.size.toLong, kept.size.toLong, md5Hex(kept.mkString(" "))))
    }.toMap
    // reference self-checks: the corpus really exercises every shape
    assert(expected(4L)._2 == 0L, "whole-doc dup must lose every token")
    assert(expected(6L)._2 == 1L, "shifted prefix copy must keep only z0")
    assert(expected(5L)._2 == 2L, "sub-k doc must be untouched")
    assert(expected(3L)._2 < expected(3L)._1, "within-doc repeat must shrink")
    // ---- the engine must agree bit for bit ----
    val got = graft.operators.Dedup
      .exactSubstringDedupOf(docs.toDF("doc_id", "text"), k = k)
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3))))
      .toMap
    assert(got == expected,
      s"engine diverged from the suffix-array reference:\n$got\nvs\n$expected")
  }

  test("x30 catches the shifted repeat x11's aligned passages miss; " +
    "keep-first is a map-side partial aggregate, no rank window") {
    import spark.implicits._
    // doc B carries doc A's first 16 words at OFFSET 1 — it straddles
    // every 16-word passage boundary, so x11 keeps everything, while
    // the arbitrary-offset pass must remove exactly those 16 tokens
    val a = (1 to 32).map(i => s"w$i").mkString(" ")
    val b = "q " + (1 to 16).map(i => s"w$i").mkString(" ") + " " +
      (1 to 15).map(i => s"r$i").mkString(" ")
    val docs = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val aligned = graft.operators.Dedup.passageDedupOf(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(aligned(1L)._1 == aligned(1L)._2,
      "x11 should MISS the shifted repeat (that is x30's reason to exist)")
    val res = graft.operators.Dedup.exactSubstringDedupOf(docs)
    val shifted = res.collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(shifted(0L) == ((32L, 32L)), "first occurrence must survive")
    assert(shifted(1L) == ((32L, 16L)),
      s"shifted 16-token copy must be removed from doc 1, got ${shifted(1L)}")
    // scale shape: keep-first collapses map-side; no ranking window
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"),
      s"keep-first is not a map-side-combinable partial aggregate:\n$plan")
    assert(!plan.contains("Window"),
      s"x30 must not rank within gram keys (mega-bucket skew):\n$plan")
  }

  test("x12 decontamination equals a naive driver-side 8-gram overlap scan") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    def grams(ws: Array[String]): Set[String] =
      if (ws.length < 8) Set.empty
      else ws.sliding(8).map(_.mkString(" ")).toSet
    val evalG = docs.filter(_._1 % 50 == 0).map { case (id, ws) => (id, grams(ws)) }
    val expected = docs.filter(_._1 % 50 != 0).flatMap { case (id, ws) =>
      val g = grams(ws)
      val hits = evalG.filter { case (_, eg) => g.exists(eg.contains) }
      if (hits.isEmpty) None
      else {
        val shared = g.filter(p => hits.exists(_._2.contains(p)))
        Some(id -> ((shared.size.toLong, hits.map(_._1).min)))
      }
    }.toMap
    val got = Dedup.x12Decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("t9 vocabulary: contiguous ranks, monotone coverage ending at 10000; " +
    "no single-reducer window") {
    val df = TextAnalysis.t9Vocab(spark, sf)
    val rows = df.collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    // counts non-increasing in rank, coverage non-decreasing, exact finish
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 >= b._2 && a._3 <= b._3 })
    assert(rows.last._3 == 10000L)
    // the rank/cumulative scan is the two-phase prefixSums now — the
    // plan must carry NO unpartitioned Window node (the former
    // vocabulary funnel) anywhere
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"t9 regrew a window rank over the vocabulary:\n$plan")
  }

  test("x20 stratified split matches a driver-side md5 recompute and " +
       "partitions the corpus; duplicate texts co-assign") {
    val got = graft.operators.Corpus.x20StratifiedSplit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // independent recompute: JVM MessageDigest, not Spark's md5
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
    def bucket(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val exp = docs.groupBy { r =>
      val b = bucket(r.getString(2))
      (r.getString(1), if (b < 90) "train" else if (b < 95) "val" else "test")
    }.map { case (k, rs) =>
      k -> (rs.length.toLong,
        rs.map(_.getString(2).split(" ", -1).length.toLong).sum,
        rs.map(_.getLong(0)).sum)
    }
    assert(got == exp, "split accounting diverged from the JVM md5 recompute")
    assert(got.values.map(_._1).sum == docs.length,
      "splits must partition the corpus exactly")
    // (content-keyed assignment — equal texts share a bucket and hence
    // a split — holds by construction and is pinned by the recompute
    // equality above: the per-text bucket function is the whole key)
  }

  test("t19 keyword extract: integer TF-IDF top-3 matches a driver-side " +
    "recompute; per-doc rank runs as a group limit, not a global sort") {
    val df = graft.operators.TextAnalysis.t19KeywordExtract(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc top-3 must prune through WindowGroupLimit:\n$plan")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split(" +").filter(_.nonEmpty)))
    val tf = docs.map { case (id, ws) =>
      id -> ws.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => w -> o.size.toLong }
    val n = tf.count(_._2.nonEmpty).toLong
    val want = tf.filter(_._2.nonEmpty).flatMap { case (id, m) =>
      m.toSeq.map { case (w, f) => (w, f, dfreq(w), f * (n * 10000L / dfreq(w))) }
        .sortBy { case (w, _, _, sc) => (-sc, w) }
        .take(3).zipWithIndex
        .map { case ((w, f, d, sc), i) => (id, i + 1) -> (w, f, d, sc) }
    }
    assert(got == want, {
      val diff = (want.keySet ++ got.keySet)
        .filter(k => want.get(k) != got.get(k)).take(3)
      s"keyword drift at $diff: got ${diff.map(got.get)}, want ${diff.map(want.get)}"
    })
  }

  test("x29 diversity sample: assignment is the true rounded-cosine argmax " +
    "(driver recompute); quotas are min(4, cluster size); full cluster coverage") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = graft.operators.Corpus.x29DiversitySample(spark, sf01).collect()
    assert(rows.nonEmpty)
    // driver-side recompute of the clustering from raw floats
    val vecs = spark.read.parquet(s"$sf01/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def nrm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val anchors = (0L until 16L).map(id => id -> vecs(id))
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); i += 1 }
      math.round(dot / (nrm(a) * nrm(b)) * 1e4) / 1e4
    }
    val wantCluster = vecs.map { case (id, v) =>
      id -> anchors.map { case (aid, av) => (cos4(v, av), aid) }
        .maxBy { case (c, aid) => (c, -aid) }._2
    }
    rows.foreach { r =>
      val (cl, id) = (r.getLong(0), r.getLong(2))
      assert(wantCluster(id) == cl, s"vec $id assigned $cl, argmax says ${wantCluster(id)}")
    }
    // per-cluster quota and coverage
    val sizesWant = wantCluster.groupBy(_._2).map { case (c, m) => c -> m.size }
    val byCluster = rows.groupBy(_.getLong(0))
    assert(byCluster.keySet == sizesWant.filter(_._2 > 0).keySet,
      "sample must cover every nonempty cluster")
    byCluster.foreach { case (c, rs) =>
      assert(rs.length == math.min(4, sizesWant(c)), s"cluster $c quota broken")
      assert(rs.head.getAs[Long]("cluster_size") == sizesWant(c).toLong)
    }
  }

  test("x21 range layout: zones partition the corpus, disjoint and sorted; " +
       "the audit fails overlapping or unsorted zones") {
    val zones = graft.operators.Corpus.x21RangeLayout(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(zones.map(_.getLong(1)).sum == nDocs,
      "zone rows must partition the corpus exactly")
    assert(zones.length >= 2, "need >= 2 zones for disjointness to bite")
    assert(zones.forall(_.getBoolean(9)), "a zone failed the audit")
    // negative controls: the audit must REJECT a broken layout
    import spark.implicits._
    val overlapping = Seq(
      graft.operators.Corpus.ZoneRow(0, 5, "en", 0, 0, "en", 100, 9, true),
      graft.operators.Corpus.ZoneRow(1, 5, "en", 50, 3, "fr", 10, 2, true))
      .toDF()
    assert(graft.operators.Corpus.zoneAudit(overlapping).collect()
      .exists(!_.getBoolean(9)), "audit passed OVERLAPPING zones")
    val unsorted = Seq(
      graft.operators.Corpus.ZoneRow(0, 5, "en", 0, 0, "en", 100, 9, false))
      .toDF()
    assert(graft.operators.Corpus.zoneAudit(unsorted).collect()
      .forall(!_.getBoolean(9)), "audit passed an UNSORTED partition")
  }

  test("t14 chunking matches a JVM recompute; coverage and overlap exact") {
    val got = TextAnalysis.t14Chunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
    val exp = docs.flatMap { r =>
      val id = r.getLong(0)
      val w = r.getString(1).split(" ", -1)
      val nChunks = (math.max(w.length - 64, 0) + 47) / 48 + 1
      (0 until nChunks).map { c =>
        val chunk = w.slice(c * 48, math.min(c * 48 + 64, w.length))
        (id, c) -> (chunk.length.toLong, md5(chunk.mkString(" ")))
      }
    }.toMap
    assert(got == exp, "chunk set diverged from the JVM recompute")
    // every token covered: per doc, sum of chunk sizes == ntok + 16·(chunks−1)
    docs.foreach { r =>
      val id = r.getLong(0); val ntok = r.getString(1).split(" ", -1).length
      val sizes = got.collect { case ((d, _), (n, _)) if d == id => n }
      assert(sizes.sum == ntok + 16L * (sizes.size - 1),
        s"doc $id: chunk sizes ${sizes.toSeq} do not tile $ntok tokens with 16-overlap")
    }
  }
}
