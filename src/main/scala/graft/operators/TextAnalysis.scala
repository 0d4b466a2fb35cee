package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Every operator here is a PURE PER-ROW projection — no shuffle at
  * all (the final ORDER BY is only for oracle determinism and would be
  * dropped in production). All counting goes through `regexp_count` /
  * length arithmetic on integers, so the DuckDB oracle matches exactly;
  * the only doubles are final ratios computed in one fixed expression
  * order on both engines. At 100 TB this surface is embarrassingly
  * parallel and whole-stage-codegen'd end to end.
  *
  * Reference analog: none (the reference has no string surface at all —
  * SURVEY.md §2.2); these are the engine-side additions.
  */
object TextAnalysis {

  private def norm: Column = lower(trim(col("text")))

  /** Language-ID by function-word evidence. The per-language score is
    * an integer regexp count; argmax with deterministic alphabetical
    * tiebreak via the max-of-(zero-padded-score ++ lang) string trick,
    * identical in both engines. */
  private val langPatterns: Seq[(String, String)] = Seq(
    "de" -> "\\b(der|die|das|und|ist|nicht|mit|ein)\\b",
    "en" -> "\\b(the|and|of|to|in|is|that|for)\\b",
    "es" -> "\\b(el|los|las|y|es|que|de|un)\\b",
    "fr" -> "\\b(le|les|et|est|que|une|dans|pour)\\b",
    "zh" -> "(的|是|在|了|和|有|我|不)")

  def t1LangId(s: SparkSession, d: String): DataFrame = {
    val scored = langPatterns.map { case (lang, pat) =>
      concat(lpad(regexp_count(norm, lit(pat)).cast("string"), 4, "0"), lit(lang))
    }
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        substring(greatest(scored: _*), 5, 2).as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  val t1Sql: String = {
    val scored = langPatterns.map { case (lang, pat) =>
      s"lpad(CAST(length(regexp_extract_all(lower(trim(text)), '$pat')) AS VARCHAR), 4, '0') || '$lang'"
    }.mkString(",\n    ")
    s"""SELECT doc_id, lang,
       |  substr(greatest(
       |    $scored), 5, 2) AS pred_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Quality scoring from length / punctuation / stopword ratios —
    * the standard cheap pre-filter for web-scale corpora. Counts are
    * integers; the score is one fixed-order double expression. */
  /** The T2 quality score as a reusable column expression (X16 orders
    * its budget selection by it — same bits there as here). */
  private[operators] def qualityCol: Column = {
    val nChars = length(norm)
    val nTokens = regexp_count(norm, lit("\\S+"))
    val punct = regexp_count(norm, lit("[.,!?;:]"))
    val stop = regexp_count(norm, lit("\\b(the|and|of|to|in|is|that|for)\\b"))
    round(
      least(lit(1.0), nTokens.cast("double") / 50.0) *
        (lit(1.0) - punct.cast("double") / (nChars.cast("double") + 1.0)) *
        (lit(0.5) + lit(0.5) * least(lit(1.0),
          stop.cast("double") * 10.0 / (nTokens.cast("double") + 1.0))), 4)
  }

  /** The same score as a DuckDB SQL snippet (shared by t2/x16 oracles). */
  private[operators] val qualitySqlExpr: String =
    """ROUND(
      |    least(1.0, CAST(length(regexp_extract_all(lower(trim(text)), '\S+')) AS DOUBLE) / 50.0)
      |    * (1.0 - CAST(length(regexp_extract_all(lower(trim(text)), '[.,!?;:]')) AS DOUBLE)
      |             / (CAST(length(lower(trim(text))) AS DOUBLE) + 1.0))
      |    * (0.5 + 0.5 * least(1.0,
      |        CAST(length(regexp_extract_all(lower(trim(text)), '\b(the|and|of|to|in|is|that|for)\b')) AS DOUBLE)
      |        * 10.0 / (CAST(length(regexp_extract_all(lower(trim(text)), '\S+')) AS DOUBLE) + 1.0))), 4)"""
      .stripMargin

  def t2Quality(s: SparkSession, d: String): DataFrame = {
    val nChars = length(norm)
    val nTokens = regexp_count(norm, lit("\\S+"))
    val punct = regexp_count(norm, lit("[.,!?;:]"))
    val stop = regexp_count(norm, lit("\\b(the|and|of|to|in|is|that|for)\\b"))
    val quality = qualityCol
    documents(s, d)
      .select(col("doc_id"), nChars.as("n_chars_norm"), nTokens.as("n_tokens"),
        punct.as("punct_cnt"), stop.as("stop_cnt"), quality.as("quality"))
      .orderBy(col("doc_id"))
  }

  val t2Sql: String =
    """SELECT doc_id,
      |  length(lower(trim(text))) AS n_chars_norm,
      |  length(regexp_extract_all(lower(trim(text)), '\S+')) AS n_tokens,
      |  length(regexp_extract_all(lower(trim(text)), '[.,!?;:]')) AS punct_cnt,
      |  length(regexp_extract_all(lower(trim(text)), '\b(the|and|of|to|in|is|that|for)\b')) AS stop_cnt,
      |  ROUND(
      |    least(1.0, CAST(length(regexp_extract_all(lower(trim(text)), '\S+')) AS DOUBLE) / 50.0)
      |    * (1.0 - CAST(length(regexp_extract_all(lower(trim(text)), '[.,!?;:]')) AS DOUBLE)
      |             / (CAST(length(lower(trim(text))) AS DOUBLE) + 1.0))
      |    * (0.5 + 0.5 * least(1.0,
      |        CAST(length(regexp_extract_all(lower(trim(text)), '\b(the|and|of|to|in|is|that|for)\b')) AS DOUBLE)
      |        * 10.0 / (CAST(length(regexp_extract_all(lower(trim(text)), '\S+')) AS DOUBLE) + 1.0))), 4) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Token counting: whitespace tokens, a BPE-ish regex segmentation
    * (letter runs | digit runs | single other), and distinct tokens. */
  def t3TokenCount(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        regexp_count(norm, lit("\\S+")).as("ws_tokens"),
        regexp_count(norm, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("bpe_tokens"),
        size(array_distinct(split(norm, "\\s+"))).as("distinct_tokens"))
      .orderBy(col("doc_id"))

  val t3Sql: String =
    """SELECT doc_id,
      |  length(regexp_extract_all(lower(trim(text)), '\S+')) AS ws_tokens,
      |  length(regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
      |  length(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS distinct_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Document fingerprint: min-hash over 8-gram windows (rolling-hash
    * style winnowing, md5 as the window hash so both engines agree) +
    * distinct window count. Zero shuffle, one pass per row.
    *
    * Round-16 optimization (guide §1.2 step 2 / §4-analog): the
    * declarative `array_min(transform(sequence(...), i ->
    * md5(substring(t, i, 8))))` paid a substring allocation, a fresh
    * MessageDigest, a byte[] copy and a 32-char hex string PER WINDOW
    * (~n_chars windows/doc) — 8.7 s at sf0.1, the 5th most expensive
    * query (round-15 verdict "What's wrong" #2). The native
    * single-pass expressions ([[org.apache.spark.sql.graft.Gram8]])
    * dedup windows before hashing, reuse one digest, and compare raw
    * 16-byte digests; results are byte-identical (DuckDB-hash
    * re-verified). */
  def t4Fingerprint(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions._
    documents(s, d)
      .select(col("doc_id"), norm.as("t"))
      .select(col("doc_id"),
        gram8MinMd5(col("t")).as("fingerprint"),
        gram8DistinctCount(col("t")).as("n_grams8"))
      .orderBy(col("doc_id"))
  }

  val t4Sql: String =
    """WITH norm AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
      |g AS (SELECT doc_id, substr(t, i, 8) AS gram
      |      FROM norm, unnest(generate_series(1, greatest(length(t)-7, 1))) AS u(i))
      |SELECT doc_id, min(md5(gram)) AS fingerprint,
      |       count(DISTINCT gram) AS n_grams8
      |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Text normalization (the canonical pre-dedup cleanup): lowercase,
    * strip non-alphanumerics, collapse whitespace — emitted as a
    * content hash + normalized length, the columns an exact-dedup
    * stage consumes. Pure projection, codegen'd, no shuffle. */
  def t5Normalize(s: SparkSession, d: String): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(trim(col("text"))), "[^a-z0-9 ]", ""), " +", " "))
    documents(s, d)
      .select(col("doc_id"),
        md5(cleaned).as("norm_hash"),
        length(cleaned).as("n_norm_chars"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB regexp_replace replaces only the first match without the
    * 'g' flag — Spark replaces all by default, hence the flags. */
  val t5Sql: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),
      |                          ' +', ' ', 'g'))) AS norm_hash,
      |  length(trim(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),
      |                             ' +', ' ', 'g'))) AS n_norm_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sampling: per-language keep-rates applied
    * by hashing the STABLE key (doc_id) — the reproducible form of
    * `df.sampleBy` (seeded RNG sampling is not reproducible across
    * engines/runs/row order; content-hash sampling is, which is why
    * large corpus pipelines sample this way). Pure per-row filter —
    * no shuffle, trivially parallel at any scale; md5 is the
    * cross-engine hash (oracle-determinism convention). */
  def t6StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    val rate = when(col("lang") === "en", 10)
      .when(col("lang") === "zh", 40).otherwise(25)
    documents(s, d)
      .filter(bucket < rate)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val t6Sql: String =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
      |      < CASE WHEN lang = 'en' THEN 10 WHEN lang = 'zh' THEN 40 ELSE 25 END
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------
  /** T7: within-document repetition signals — the Gopher/C4-style
    * quality rules a pretraining filter runs on every document: the
    * fraction of words taken by the single most frequent word, and the
    * fraction of bigram occurrences that belong to a repeated bigram.
    * Counts are exact integers from one narrow typed pass (per-doc
    * hash maps, no shuffle); the ratios are single double divisions
    * rounded identically on both engines. */
  def t7Repetition(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), norm.as("t")).as[(Long, String)]
      .map { case (id, t) =>
        val words = t.split(" +").filter(_.nonEmpty)
        val n = words.length
        val wc = scala.collection.mutable.HashMap.empty[String, Long]
        words.foreach(w => wc.update(w, wc.getOrElse(w, 0L) + 1))
        val top = if (n == 0) 0L else wc.values.max
        val bc = scala.collection.mutable.HashMap.empty[String, Long]
        var i = 0
        while (i + 1 < n) {
          val b = words(i) + " " + words(i + 1)
          bc.update(b, bc.getOrElse(b, 0L) + 1)
          i += 1
        }
        val dup = bc.values.filter(_ > 1).sum
        (id, n.toLong, top, math.max(n - 1, 0).toLong, dup)
      }
      .toDF("doc_id", "n_words", "top_word_n", "n_bigrams", "dup_bigram_n")
      .withColumn("top_ratio4",
        when(col("n_words") === 0, lit(0.0)).otherwise(
          round(col("top_word_n").cast("double") / col("n_words"), 4)))
      .withColumn("dup_ratio4",
        when(col("n_bigrams") === 0, lit(0.0)).otherwise(
          round(col("dup_bigram_n").cast("double") / col("n_bigrams"), 4)))
      .orderBy(col("doc_id"))
  }

  /** X7: heavy hitters — the exact top-20 tokens by frequency,
    * cross-checked in-query against a Count–Min sketch
    * (`org.apache.spark.util.sketch.CountMinSketch`, seeded). Output
    * rows are the EXACT counts (DuckDB-checkable); the sketch
    * contributes the `sketch_*_ok` verdict columns: a CMS estimate
    * can never undercount, and with depth 5 (confidence 0.99) these
    * heavy tokens don't overcount past cnt + ⌈eps·N⌉ — for a fixed
    * corpus and seed both facts are deterministic, so the oracle pins
    * them TRUE and a sketch regression flips the driver's hash gate.
    *
    * 100 TB story: the exact groupBy exists for the oracle; the
    * sketch is the scale path — fixed 5×⌈2/eps⌉-int state per
    * partition, merged associatively on the driver (the same shape
    * as a treeAggregate), so no shuffle of token rows at all. Heavy-
    * hitter candidates then need only a broadcast verification pass
    * instead of a full-corpus aggregation, and sketches from
    * different days/shards merge losslessly (the mergeability the
    * reference's identity-reduce barrier O20 lacks entirely). */
  def x7HeavyHitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .cache()
    val total = toks.count()
    val eps = 0.001
    val cms = toks.stat.countMinSketch("token", eps, 0.99, 42)
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(20).collect() // bounded: limit(20)
    toks.unpersist()
    top.toSeq.map { r =>
      val t = r.getString(0); val c = r.getLong(1)
      val est = cms.estimateCount(t)
      (t, c, est >= c, est <= c + math.ceil(eps * total).toLong)
    }.toDF("token", "cnt", "sketch_lower_ok", "sketch_upper_ok")
  }

  val x7Sql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
      |c AS (SELECT token, COUNT(*) AS cnt FROM tok
      |      WHERE length(token) > 0 GROUP BY 1)
      |SELECT token, cnt, TRUE AS sketch_lower_ok, TRUE AS sketch_upper_ok
      |FROM c ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  val t7Sql: String =
    """WITH norm AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
      |sp AS (SELECT doc_id, string_split_regex(t, ' +') AS words FROM norm),
      |w AS (SELECT doc_id, i, words[i] AS word
      |      FROM sp, unnest(generate_series(1, len(words))) AS u(i)
      |      WHERE words[i] <> ''),
      |wc AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
      |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
      |               CAST(MAX(c) AS BIGINT) AS top_n FROM wc GROUP BY 1),
      |bg AS (SELECT a.doc_id, a.word || ' ' || b.word AS bigram
      |       FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |bt AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
      |              CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_n
      |       FROM bc GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(tot.n_words, 0) AS n_words,
      |  COALESCE(tot.top_n, 0) AS top_word_n,
      |  COALESCE(bt.n_bigrams, 0) AS n_bigrams,
      |  COALESCE(bt.dup_n, 0) AS dup_bigram_n,
      |  CASE WHEN COALESCE(tot.n_words, 0) = 0 THEN 0.0
      |       ELSE ROUND(CAST(tot.top_n AS DOUBLE) / tot.n_words, 4) END AS top_ratio4,
      |  CASE WHEN COALESCE(bt.n_bigrams, 0) = 0 THEN 0.0
      |       ELSE ROUND(CAST(bt.dup_n AS DOUBLE) / bt.n_bigrams, 4) END AS dup_ratio4
      |FROM documents d
      |LEFT JOIN tot ON tot.doc_id = d.doc_id
      |LEFT JOIN bt ON bt.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** T8: per-document TF-IDF top terms — the "what is this document
    * about" keyword signal a corpus browser / topic filter runs. idf
    * is the exact rational N/df rather than ln(N/df): a transcendental
    * log differs between engines in the last ulps (Java Math.log is
    * not correctly-rounded), while tf·N is an exact integer and one
    * double division is bit-identical everywhere — and x ↦ ln(x) is
    * monotone, so the rational form produces the SAME ranking.
    *
    * Scale shape: one explode + (doc, term)-keyed count (map-side
    * combined), a term-keyed count for df (|vocab| rows — broadcast
    * back to the tf table, so the only full-data shuffle is the tf
    * aggregate), and a per-doc top-k ranking window on the uniform
    * doc_id key. At web scale the df table IS small relative to the
    * corpus (vocab grows ~Heaps' law, √-ish), which is what makes the
    * broadcast the right call at 100 TB too. */
  def t8TfIdf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // doc count folded into the plan as a broadcast 1-row aggregate
    // (same one-job shape as t9's total) instead of a separate action
    val nd = documents(s, d).agg(count(lit(1)).as("n_docs"))
    val tf = documents(s, d)
      .select(col("doc_id"), explode(split(norm, " +")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(nd)) // bounded: nd is ONE row
      .withColumn("tfidf4", round((col("tf") * col("n_docs")).cast("double") / col("df"), 4))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf4").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf4"), col("rn"))
      .orderBy(col("doc_id"), col("rn"))
  }

  val t8Sql: String =
    """WITH nrm AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
      |tok AS (SELECT doc_id, unnest(string_split_regex(t, ' +')) AS term FROM nrm),
      |tft AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
      |        WHERE term <> '' GROUP BY 1, 2),
      |dft AS (SELECT term, COUNT(*) AS df FROM tft GROUP BY 1),
      |nt AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (SELECT doc_id, term, tf, df,
      |                  ROUND(CAST(tf * n AS DOUBLE) / df, 4) AS tfidf4
      |           FROM tft JOIN dft USING (term) CROSS JOIN nt)
      |SELECT doc_id, term, tf, df, tfidf4, rn FROM (
      |  SELECT doc_id, term, tf, df, tfidf4,
      |         ROW_NUMBER() OVER (PARTITION BY doc_id
      |                            ORDER BY tfidf4 DESC, term) AS rn
      |  FROM scored) s
      |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin

  // ---------------------------------------------------------------- T9
  /** Corpus vocabulary with Zipf rank and cumulative coverage — the
    * precompute for tokenizer/vocab construction (how many types cover
    * 90% of tokens?) and for stopword-list derivation. One narrow
    * tokenize pass + one map-side-combined count aggregate; the rank/
    * cumulative scan runs over the VOCABULARY, not the corpus (Heaps'
    * law bounds distinct types at a few million even for 100 TB
    * corpora) — and since round 11 it is the shared two-phase
    * [[graft.operators.Corpus.prefixSums]] (range partition by
    * (cnt desc, token), per-partition totals to the driver, broadcast
    * offsets) rather than an unpartitioned window: rank = the prefix
    * of a constant-1 column, cumulative count = the prefix of `cnt`,
    * so even a pathological vocabulary never funnels through one
    * reducer. Coverage is emitted in integer BASIS POINTS
    * ((cum·10⁴) div total — exact integer arithmetic, no float
    * division to disagree on); the grand total reads off the CACHED
    * partitioned vocab frame inside prefixSums, not a second corpus
    * pass. */
  def t9Vocab(s: SparkSession, d: String): DataFrame = {
    val counts = documents(s, d)
      .select(explode(split(norm, " +")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("one", lit(1L))
    val ranked = graft.operators.Corpus.prefixSums(counts,
      Seq(col("cnt").desc, col("token")), Seq("one", "cnt"))
    val total = ranked.agg(sum(col("cnt")).as("total"))
    ranked
      .crossJoin(broadcast(total)) // bounded: total is ONE row
      .select(col("token"), col("cnt"),
        (col("prefix_one") + 1L).as("rnk"),
        expr("((prefix_cnt + cnt) * 10000) div total").as("coverage_bp"))
      .orderBy(col("rnk"))
  }

  val t9Sql: String =
    """WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS token
      |             FROM documents),
      |c AS (SELECT token, COUNT(*) AS cnt FROM tok WHERE len(token) > 0 GROUP BY 1),
      |r AS (SELECT token, cnt,
      |             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk,
      |             CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token
      |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |             CAST(SUM(cnt) OVER () AS BIGINT) AS total
      |      FROM c)
      |SELECT token, cnt, rnk, (cum * 10000) // total AS coverage_bp
      |FROM r ORDER BY rnk""".stripMargin

  // ---------------------------------------------------------------- T10
  /** PII redaction — the standard pre-release scrub: emails, NANP-style
    * phone numbers and IPv4 addresses replaced by typed placeholder
    * tokens, with per-class match counts. Pure per-row regexp work
    * (codegen'd `regexp_replace`/`regexp_count`), narrow end to end.
    *
    * The synthetic corpus contains no PII (it has no digits at all), so
    * the operator deterministically APPENDS one instance of each class
    * derived from doc_id before scrubbing — the redaction machinery runs
    * against live matches and the oracle verifies the full replace
    * pipeline byte-for-byte (md5 of the scrubbed text), not a no-op.
    * Patterns stay in the RE2 ∩ java.util.regex common subset (no
    * backrefs, no lookaround) so both engines match identically; DuckDB
    * needs the 'g' flag to mirror Spark's replace-all. */
  private val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhonePat = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  private val Ipv4Pat  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def t10PiiRedact(s: SparkSession, d: String): DataFrame = {
    val pii = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or "),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-555-0199 at 10.0."),
      (col("doc_id") % 256).cast("string"), lit(".7"))
    documents(s, d)
      .select(col("doc_id"), pii.as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(EmailPat)).as("n_email"),
        regexp_count(col("t"), lit(PhonePat)).as("n_phone"),
        regexp_count(col("t"), lit(Ipv4Pat)).as("n_ip"),
        md5(regexp_replace(
          regexp_replace(
            regexp_replace(col("t"), EmailPat, "<EMAIL>"),
            PhonePat, "<PHONE>"),
          Ipv4Pat, "<IP>")).as("red_hash"))
      .orderBy(col("doc_id"))
  }

  val t10Sql: String = {
    val email = EmailPat // `\.` survives interpolation unprocessed
    s"""WITH p AS (SELECT doc_id,
       |             text || ' contact user' || doc_id || '@example.com or '
       |                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       |                  || '-555-0199 at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
       |                  || '.7' AS t
       |           FROM documents)
       |SELECT doc_id,
       |  length(regexp_extract_all(t, '$email')) AS n_email,
       |  length(regexp_extract_all(t, '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b')) AS n_phone,
       |  length(regexp_extract_all(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ip,
       |  md5(regexp_replace(
       |    regexp_replace(
       |      regexp_replace(t, '$email', '<EMAIL>', 'g'),
       |      '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g'),
       |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g')) AS red_hash
       |FROM p ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- T11
  /** BM25 keyword retrieval (fixed 3-term query) — the text-retrieval
    * counterpart of the S-family's vector search, as a pipeline uses it
    * for quality-targeted selection ("find docs about X to upsample").
    *
    * Scale shape: per-term tf and doc length are pure `regexp_count`
    * projections (the query is known, so there is NO tokenize-explode
    * and NO posting-list shuffle — the corpus is scanned once, narrow);
    * corpus stats (N, Σlen, per-term df) are ONE broadcast single-row
    * aggregate (t9's one-job shape); the top-20 is a TakeOrderedAndProject
    * (per-partition heaps, never a global sort). Scoring uses the
    * rational-idf BM25 variant ((N−df+0.5)/(df+0.5), k1=1.2, b=0.75) —
    * rank-equivalent to the log form, but every operation is a single
    * IEEE mul/div/add in a FIXED order mirrored in the oracle SQL, so
    * the scores hash-match bit-for-bit (the same move as T8's rational
    * idf; ln would differ in the last ulp across libm builds). */
  private val Bm25Terms = Seq("spark", "table", "window")

  /** The scored-but-unranked BM25 frame (doc_id, tf_*, score4 > 0) —
    * t11's body up to its top-k, shared with the hybrid fusion s16
    * (which needs the same scores under a different rank cut). */
  private[operators] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val tfCols = Bm25Terms.map(t =>
      regexp_count(norm, lit(s"\\b$t\\b")).cast("long").as(s"tf_$t"))
    val base = documents(s, d).select(
      col("doc_id") +: regexp_count(norm, lit("\\S+")).cast("long").as("len") +: tfCols: _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("len")).as("sum_len") +:
        Bm25Terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
    val score = Bm25Terms.map { t =>
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"df_$t").cast("double")
      val idf = (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5))
      val lenRatio = (col("len") * col("n_docs")).cast("double") /
        col("sum_len").cast("double")
      idf * tf * lit(2.2) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * lenRatio))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats)) // bounded: stats is ONE row
      .withColumn("score4", round(score, 4))
      .filter(col("score4") > 0)
  }

  def t11Bm25Search(s: SparkSession, d: String): DataFrame =
    bm25Scored(s, d)
      .select(col("doc_id") +: Bm25Terms.map(t => col(s"tf_$t")) :+ col("score4"): _*)
      .orderBy(col("score4").desc, col("doc_id"))
      .limit(20)

  /** The WITH-clauses producing `scored(doc_id, tf_*, score4)` —
    * t11's oracle body, shared with s16's fusion oracle. */
  private[operators] val bm25SqlCte: String = {
    val tfDefs = Bm25Terms.map(t =>
      s"CAST(length(regexp_extract_all(lower(trim(text)), '\\b$t\\b')) AS BIGINT) AS tf_$t")
      .mkString(",\n      |  ")
    val dfDefs = Bm25Terms.map(t =>
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
      .mkString(",\n      |  ")
    val scoreExpr = Bm25Terms.map(t =>
      s"""((CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5))
         |      * CAST(tf_$t AS DOUBLE) * 2.2
         |      / (CAST(tf_$t AS DOUBLE) + 1.2 * (0.25
         |         + 0.75 * (CAST(len * n_docs AS DOUBLE) / CAST(sum_len AS DOUBLE))))"""
        .stripMargin).mkString("\n      |  + ")
    s"""WITH base AS (SELECT doc_id,
       |  CAST(length(regexp_extract_all(lower(trim(text)), '\\S+')) AS BIGINT) AS len,
       |  $tfDefs
       |  FROM documents),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len) AS BIGINT) AS sum_len,
       |  $dfDefs
       |  FROM base),
       |scored AS (SELECT doc_id, ${Bm25Terms.map(t => s"tf_$t").mkString(", ")},
       |  ROUND($scoreExpr, 4) AS score4
       |FROM base CROSS JOIN st)""".stripMargin
  }

  val t11Sql: String =
    s"""$bm25SqlCte
       |SELECT * FROM scored WHERE score4 > 0
       |ORDER BY score4 DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- T12
  /** LM-perplexity quality scoring (the CCNet/Gopher signal: score each
    * document by a language model and filter the tail): an add-one-
    * smoothed BIGRAM model is trained over the corpus in one pair
    * aggregate, then every document is scored per bigram as
    * -ln((c(w1,w2)+1)/(c(w1)+V)) averaged over its bigrams.
    *
    * Scale shape: training is ONE map-side-combined groupBy over token
    * pairs (the observed-bigram table is Heaps-bounded like T9's vocab,
    * ≪ corpus); scoring joins the count tables against a narrow pair
    * explode. The JOIN STRATEGY is a wired plan switch, not a comment:
    * when the trained model is small (vocab below
    * [[t12BroadcastMaxVocab]]) the count tables broadcast — zero
    * shuffle of the corpus; above it (a 100 TB corpus trains GB-scale
    * tables no executor should hold twice) the same score join runs as
    * a shuffle join on the token keys and only the 1-row stats remain
    * broadcast. Both paths produce identical scores — the switch moves
    * bytes, not math — spec'd in PipelineSpec by forcing the threshold
    * to 0 and asserting plan + bit-identical answers.
    *
    * Correctness: `ln` is transcendental, so cross-engine hashing is
    * unsafe (last-ulp libm differences) — like the matrix family this
    * is invariant-gated, with the tight check in ScalaTest: the
    * in-query `pass` asserts the PROVABLE per-doc bounds
    * 0 < nll ≤ ln(cmax+V) (each smoothed probability satisfies
    * (c12+1)/(c1+V) ∈ [1/(cmax+V), 1) because c12 ≤ c1 ≤ cmax — a
    * null-mishandled join or inverted ratio lands outside), and
    * PipelineSpec recomputes every score exactly against an
    * independent driver-side model (|Δ| < 1e-9). */
  /** Vocab-size ceiling for broadcasting the trained model tables:
    * above it the score join switches to a shuffle join (the unigram
    * table has V rows and the bigram table Heaps-many — both broadcast
    * copies per executor at small V, neither affordable at corpus
    * scale). Gate-scale vocabularies sit far below it, so the driver's
    * recorded answers ride the broadcast path unchanged. */
  private val t12BroadcastMaxVocab = 1000000L

  def t12LmPerplexity(s: SparkSession, d: String): DataFrame =
    t12LmPerplexityImpl(s, d, t12BroadcastMaxVocab)

  private[graft] def t12LmPerplexityImpl(s: SparkSession, d: String,
                                         broadcastMaxVocab: Long): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), split(norm, " +").as("w"))
      .filter(size(col("w")) >= 2)
    val pairs = toks.select(col("doc_id"),
        expr("size(w) - 1").as("n_pairs"),
        // round-16: arrays_zip(slice, slice) — same (w[i], w[i+1]) pairs,
        // but Slice/ArraysZip are codegen'd where the transform lambda
        // ran interpreted per pair
        explode(arrays_zip(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1))).as("p"))
      .select(col("doc_id"), col("n_pairs"),
        col("p")("0").as("w1"), col("p")("1").as("w2"))
    val bigrams = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    // cached: the stats job below and the score join both consume the
    // unigram table — one Heaps-bounded CacheManager entry, dropped by
    // the caller's clearCache like every other operator cache
    val unigrams = toks
      .select(explode(col("w")).as("t")).groupBy(col("t")).agg(count(lit(1)).as("c1"))
      .cache()
    val stats = unigrams.agg(count(lit(1)).as("v"), max(col("c1")).as("cmax"))

    // the plan switch: V comes off the 1-row stats aggregate (one tiny
    // driver job) — one long decides how the model tables move, and the
    // collected stats fold back in as literals (no crossJoin recompute)
    val statsRow = stats.collect()(0) // bounded: ONE-row stats aggregate
    // an empty unigram table (no doc with >=2 tokens) yields a null
    // max(c1) — treat it as 0 rather than crash the driver; the scored
    // frame below is empty anyway in that case
    val vocab = if (statsRow.isNullAt(0)) 0L else statsRow.getLong(0)
    val cmax = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)
    def sized(df: DataFrame): DataFrame =
      if (vocab <= broadcastMaxVocab) broadcast(df) else df

    val scored = pairs
      .join(sized(unigrams), col("w1") === col("t"), "left")
      .join(sized(bigrams.withColumnRenamed("c12", "cb")
        .withColumnRenamed("w1", "b1").withColumnRenamed("w2", "b2")),
        col("w1") === col("b1") && col("w2") === col("b2"), "left")
      .select(col("doc_id"), col("n_pairs"), lit(vocab).as("v"), lit(cmax).as("cmax"),
        (-log((coalesce(col("cb"), lit(0L)).cast("double") + 1.0) /
          (coalesce(col("c1"), lit(0L)).cast("double") + lit(vocab).cast("double")))).as("nll"))
    scored.groupBy(col("doc_id"))
      .agg((sum(col("nll")) / max(col("n_pairs"))).as("nll"),
        max(col("v")).as("v"), max(col("cmax")).as("cmax"),
        max(col("n_pairs")).as("n_pairs"))
      .select(col("doc_id"), col("n_pairs"), round(col("nll"), 4).as("nll4"),
        (col("nll") > 0.0 &&
          col("nll") <= log(col("cmax").cast("double") + col("v").cast("double")) + 1e-9)
          .as("pass"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------- T21
  /** Interpolated KNESER-NEY LM-perplexity scoring — the smoothing the
    * public CCNet pipeline's quality filter actually ships (a
    * KN-smoothed Wikipedia LM), beside T12's add-one baseline. KN
    * re-ranks exactly where add-one is known to mis-score: add-one
    * crushes rare-but-valid continuations toward 1/V while KN backs
    * off to how PROMISCUOUS a word is (its distinct-left-context
    * count), not how frequent. Standard interpolated form, D = 3/4:
    *
    *   p_cont(w₂)  = N₁₊(·w₂) / B            (distinct left-contexts / distinct bigrams)
    *   λ(w₁)       = D · N₁₊(w₁·) / c(w₁·)
    *   p(w₂|w₁)    = (c(w₁,w₂) − D)/c(w₁·) + λ(w₁) · p_cont(w₂)
    *
    * Scoring the training corpus itself means every scored bigram is
    * observed (c₁₂ ≥ 1 > D), so p is total and strictly positive.
    *
    * Scale shape: T12's exactly — ONE pair explode feeds every model
    * table (bigram counts; the context and continuation tables fold off
    * the Heaps-bounded bigram table, NOT the corpus); the score join
    * broadcasts the model below [[t12BroadcastMaxVocab]] and shuffles
    * on the token keys above it — same switch, same
    * both-paths-identical contract (spec'd).
    *
    * Correctness: ln is transcendental → invariant-gated like T12. The
    * in-query `pass` asserts the PROVABLE per-doc bounds: every scored
    * pair joined (n_scored = n_pairs — an inner-join row loss cannot
    * silently shrink the average), 0 ≤ nll (Σ_{w₂} p(w₂|w₁) = 1 with
    * positive terms ⇒ p ≤ 1) and nll ≤ ln(4·ctxmax) + ε (p ≥
    * (c₁₂−D)/c(w₁·) ≥ (1−D)/ctxmax = 1/(4·ctxmax)). PipelineSpec
    * recomputes every score against an independent driver-side KN
    * model (|Δ| < 1e-9) and forces both join regimes. */
  def t21KnPerplexity(s: SparkSession, d: String): DataFrame =
    t21KnPerplexityImpl(s, d, t12BroadcastMaxVocab)

  private[graft] def t21KnPerplexityImpl(s: SparkSession, d: String,
                                         broadcastMaxVocab: Long): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), split(norm, " +").as("w"))
      .filter(size(col("w")) >= 2)
    val pairs = toks.select(col("doc_id"),
        expr("size(w) - 1").as("n_pairs"),
        // round-16: arrays_zip(slice, slice) — same (w[i], w[i+1]) pairs,
        // but Slice/ArraysZip are codegen'd where the transform lambda
        // ran interpreted per pair
        explode(arrays_zip(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1))).as("p"))
      .select(col("doc_id"), col("n_pairs"),
        col("p")("0").as("w1"), col("p")("1").as("w2"))
    // cached: ctx/cont/stats and the score join all fold off this one
    // Heaps-bounded table; dropped by the caller's clearCache
    val bigrams = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12")).cache()
    // KN's denominator is w1's count AS A CONTEXT (= Σ_w2 c12, which
    // differs from the raw unigram count by each doc's final token)
    val ctx = bigrams.groupBy(col("w1"))
      .agg(sum(col("c12")).as("cctx"), count(lit(1)).as("nafter"))
    val cont = bigrams.groupBy(col("w2")).agg(count(lit(1)).as("nbefore"))
    // ONE tiny stats job: context-vocab size (the regime switch), the
    // bound's ctxmax, and B = Σ N₁₊(w1·) = distinct bigram count
    val statsRow = ctx.agg(count(lit(1)).as("v"), max(col("cctx")).as("cmax"),
      sum(col("nafter")).as("b")).collect()(0) // bounded: ONE-row stats aggregate
    val vocab = if (statsRow.isNullAt(0)) 0L else statsRow.getLong(0)
    val ctxmax = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)
    val nBigrams = if (statsRow.isNullAt(2)) 0L else statsRow.getLong(2)
    def sized(df: DataFrame): DataFrame =
      if (vocab <= broadcastMaxVocab) broadcast(df) else df
    val d75 = lit(0.75)
    val scored = pairs
      .join(sized(bigrams), Seq("w1", "w2"))
      .join(sized(ctx), Seq("w1"))
      .join(sized(cont), Seq("w2"))
      .select(col("doc_id"), col("n_pairs"),
        (-log((col("c12").cast("double") - d75) / col("cctx").cast("double") +
          d75 * col("nafter").cast("double") / col("cctx").cast("double") *
            (col("nbefore").cast("double") / lit(nBigrams).cast("double"))))
          .as("nll"))
    scored.groupBy(col("doc_id"))
      .agg((sum(col("nll")) / max(col("n_pairs"))).as("nll"),
        count(lit(1)).as("n_scored"), max(col("n_pairs")).as("n_pairs"))
      .select(col("doc_id"), col("n_pairs"), round(col("nll"), 4).as("nll4"),
        (col("n_scored") === col("n_pairs") &&
          col("nll") >= -1e-9 &&
          col("nll") <= log(lit(4.0) * lit(ctxmax).cast("double")) + 1e-9)
          .as("pass"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------- T13
  /** Gopher-style rule filter (Rae et al. 2021's document-quality
    * heuristics, adapted to this corpus's vocabulary): per document —
    * word count bounds, mean-word-length band, minimum stopword
    * fraction, maximum top-word (repetition) fraction — emitted as
    * INTEGER evidence columns plus the composed `keep` verdict. Every
    * rule compares integers (3·n ≤ totlen, 50·stops ≥ n, 5·top ≤ n …)
    * so Spark and the oracle agree bit-for-bit with no float boundary.
    *
    * Scale shape: one narrow projection — the per-document counts are
    * higher-order array folds (aggregate/filter/transform over the
    * split words), no explode, no shuffle, no UDF; at 100 TB this is
    * a single pass over the text column, the same cost class as T2. */
  /** The T13 rule columns over any frame carrying a `w` words column —
    * stateless, so the streaming quality monitor (ST9) applies the SAME
    * expressions unchanged. */
  private[graft] def gopherRules(df: DataFrame): DataFrame =
    df.withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("tot_wlen", expr("aggregate(w, 0L, (acc, x) -> acc + length(x))"))
      .withColumn("stop_cnt", expr("CAST(size(filter(w, x -> x IN " +
        "('the','a','of','to','in','is','that','for','and'))) AS LONG)"))
      .withColumn("top_cnt", expr("CAST(array_max(transform(array_distinct(w), " +
        "x -> size(filter(w, y -> y = x)))) AS LONG)"))
      .withColumn("keep",
        col("n_words").between(30, 100000) &&
          col("tot_wlen") >= col("n_words") * 3 &&
          col("tot_wlen") <= col("n_words") * 10 &&
          col("stop_cnt") * 50 >= col("n_words") &&
          col("top_cnt") * 5 <= col("n_words"))

  def t13GopherQuality(s: SparkSession, d: String): DataFrame =
    gopherRules(documents(s, d).select(col("doc_id"), split(norm, " ").as("w")))
      .drop("w")
      .orderBy(col("doc_id"))

  val t13Sql: String =
    """WITH w AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents),
      |t AS (SELECT doc_id, x FROM w, unnest(ws) AS u(x)),
      |s AS (SELECT doc_id, count(*) AS n_words,
      |             CAST(sum(length(x)) AS BIGINT) AS tot_wlen,
      |             count(*) FILTER (x IN ('the','a','of','to','in','is','that','for','and')) AS stop_cnt
      |      FROM t GROUP BY doc_id),
      |m AS (SELECT doc_id, max(c) AS top_cnt
      |      FROM (SELECT doc_id, x, count(*) AS c FROM t GROUP BY doc_id, x) GROUP BY doc_id)
      |SELECT s.doc_id, s.n_words, s.tot_wlen, s.stop_cnt, m.top_cnt,
      |  (s.n_words BETWEEN 30 AND 100000
      |   AND s.tot_wlen >= 3 * s.n_words AND s.tot_wlen <= 10 * s.n_words
      |   AND 50 * s.stop_cnt >= s.n_words AND 5 * m.top_cnt <= s.n_words) AS keep
      |FROM s JOIN m USING (doc_id) ORDER BY s.doc_id""".stripMargin

  // ------------------------------------------------------------- X25
  /** X25: the DATA CARD rollup — per-source corpus governance
    * statistics (the "datasheet for datasets" table every curated
    * corpus ships with): document and token volume, language spread,
    * the t13 Gopher-rule pass rate, and compositional shares, all as
    * INTEGERS or basis points (shares ×10⁴ via integer division) so
    * the whole card is hash-exact cross-engine — no float, no
    * transcendental.
    *
    * Scale shape: ONE pass over the corpus (the [[gopherRules]]
    * columns are narrow array folds, no explode), one map-side-
    * combined aggregate keyed by source (output = |sources| rows), a
    * broadcast 1-row total for the share denominators. At 100 TB this
    * is the same cost class as t13 plus a tiny aggregate. */
  def x25DataCard(s: SparkSession, d: String): DataFrame = {
    val perDoc = gopherRules(
      documents(s, d).select(col("doc_id"), col("source"), col("lang"),
        split(norm, " ").as("w")))
      .drop("w")
    val bySource = perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_words")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      max(col("n_words")).as("max_doc_tokens"))
    val total = bySource.agg(sum(col("n_tokens")).as("tot_tokens"))
    bySource.crossJoin(broadcast(total)) // bounded: total is ONE row
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_keep"),
        expr("n_keep * 10000L div n_docs").as("keep_bp"),
        expr("n_tokens * 10000L div tot_tokens").as("share_bp"),
        expr("n_tokens div n_docs").as("mean_doc_tokens"),
        col("max_doc_tokens"))
      .orderBy(col("source"))
  }

  val x25Sql: String =
    """WITH w AS (SELECT doc_id, source, lang,
      |             string_split(lower(trim(text)), ' ') AS ws FROM documents),
      |t AS (SELECT doc_id, x FROM w, unnest(ws) AS u(x)),
      |s AS (SELECT doc_id, count(*) AS n_words,
      |             CAST(sum(length(x)) AS BIGINT) AS tot_wlen,
      |             count(*) FILTER (x IN ('the','a','of','to','in','is','that','for','and')) AS stop_cnt
      |      FROM t GROUP BY doc_id),
      |m AS (SELECT doc_id, max(c) AS top_cnt
      |      FROM (SELECT doc_id, x, count(*) AS c FROM t GROUP BY doc_id, x) GROUP BY doc_id),
      |v AS (SELECT w.doc_id, w.source, w.lang, s.n_words,
      |        (s.n_words BETWEEN 30 AND 100000
      |         AND s.tot_wlen >= 3 * s.n_words AND s.tot_wlen <= 10 * s.n_words
      |         AND 50 * s.stop_cnt >= s.n_words AND 5 * m.top_cnt <= s.n_words) AS keep
      |      FROM w JOIN s ON s.doc_id = w.doc_id JOIN m ON m.doc_id = w.doc_id),
      |bysrc AS (SELECT source, COUNT(*) AS n_docs,
      |            CAST(SUM(n_words) AS BIGINT) AS n_tokens,
      |            CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |            CAST(COUNT(*) FILTER (keep) AS BIGINT) AS n_keep,
      |            CAST(MAX(n_words) AS BIGINT) AS max_doc_tokens
      |          FROM v GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM bysrc)
      |SELECT source, n_docs, n_tokens, n_langs, n_keep,
      |  n_keep * 10000 // n_docs AS keep_bp,
      |  n_tokens * 10000 // tot_tokens AS share_bp,
      |  n_tokens // n_docs AS mean_doc_tokens,
      |  max_doc_tokens
      |FROM bysrc CROSS JOIN tot ORDER BY source""".stripMargin

  // ------------------------------------------------------------- T14
  /** T14: sliding-window passage chunking — the retrieval/context-prep
    * step that turns documents into fixed-size overlapping token
    * windows (64-token chunks, stride 48 ⇒ 16-token overlap, last
    * chunk partial). Emits per chunk the token count and the md5 of
    * the re-joined chunk text, so the oracle verifies exact chunk
    * CONTENT and boundaries, not just counts — an off-by-one in the
    * window arithmetic flips every hash.
    *
    * Chunk starts are 0, 48, 96, … with ⌈max(ntok−64, 0)/48⌉ + 1
    * chunks per document: every token is covered, every document
    * (however short) yields at least one chunk, and consecutive chunks
    * share exactly 16 tokens — the overlap that keeps a passage
    * retrievable when an answer straddles a boundary.
    *
    * Scale shape: `posexplode(sequence(…))` over a per-row integer +
    * codegen'd `slice`/`concat_ws`/`md5` — a narrow ~1.33× row blow-up
    * with ZERO shuffle (the ORDER BY is oracle determinism only). At
    * 100 TB this is the same single-pass cost class as T3; the chunk
    * table writes straight to the training shuffle's input. */
  def t14Chunk(s: SparkSession, d: String): DataFrame = {
    val W = 64; val S = 48
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("ntok", size(col("w")).cast("long"))
      .select(col("doc_id"), col("w"), col("ntok"),
        explode(sequence(lit(0),
          expr(s"CAST((greatest(ntok - $W, 0) + ${S - 1}) DIV $S AS INT)")))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        size(slice(col("w"), col("chunk_id") * S + 1, lit(W))).cast("long").as("n_tok"),
        md5(concat_ws(" ", slice(col("w"), col("chunk_id") * S + 1, lit(W)))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val t14Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, ws, ntok,
      |         unnest(generate_series(0,
      |           CAST((greatest(ntok - 64, 0) + 47) // 48 AS INT))) AS chunk_id
      |  FROM t)
      |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
      |       CAST(least(64, ntok - chunk_id * 48) AS BIGINT) AS n_tok,
      |       md5(array_to_string(
      |         list_slice(ws, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ')) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // ------------------------------------------------------------- T15
  /** T15: distributed BPE tokenizer TRAINING — the canonical
    * vocabulary-construction step of an LLM data pipeline (Sennrich et
    * al. 2016's merge loop), run Spark-side. The corpus is touched
    * EXACTLY ONCE (the word-count aggregate); the entire merge loop
    * then iterates over the Heaps-bounded word-frequency frame (unique
    * words × counts ≪ corpus — the same model-not-corpus shape as
    * t12's LM tables), so 100 TB of text trains at vocabulary cost.
    * Each of the 16 iterations is: adjacent-symbol-pair counts as ONE
    * map-side-combinable aggregate over the word frame, argmax by
    * (count desc, pair lexicographic) planned as a heap top-1
    * (TakeOrderedAndProject), and a narrow typed map applying the merge
    * (the pair reaches executors as two captured strings — M15's
    * scalars-only driver-traffic discipline); lineage is
    * localCheckpoint-truncated every 4 merges.
    *
    * No SQL oracle — the merge recurrence has no tractable SQL twin
    * (t12's spec-exact pattern instead: a driver-side reference BPE
    * must reproduce the merge TABLE exactly, spec'd). The in-query
    * `pass` gate holds real invariants: selected counts are
    * NON-INCREASING across ranks (any pair created by a merge occurs
    * at most as often as that merge did — so a rising count proves a
    * counting bug), every count ≥ 1, and vocab_size advances by
    * exactly 1 per merge from the initial symbol alphabet.
    *
    * Word boundaries are merge boundaries (no cross-word pairs, no
    * end-of-word marker — documented simplification; merges stay
    * within words).
    *
    * REGIME SWITCH (t12's broadcast-ceiling discipline applied to the
    * merge loop): a production tokenizer needs 30k-50k merges, and the
    * distributed loop costs ~3 Spark jobs per merge — ~100k sequential
    * scheduler round-trips that no cluster amortizes. But the merge
    * loop's working set is the WORD FRAME, not the corpus, and Heaps'
    * law keeps unique-words ≪ corpus — usually driver-sized. So: after
    * the one corpus-wide word-count aggregate, if the word frame has
    * ≤ [[t15DriverLocalMaxWords]] rows it is collected ONCE and the
    * whole merge loop runs driver-local with incremental pair-count
    * maintenance (a lazy-deletion heap for the argmax; only words
    * containing the merged pair are touched per merge — the
    * HuggingFace-trainer shape, O(affected words) per merge instead of
    * O(word frame)). Above the ceiling the distributed loop takes over
    * unchanged. Both regimes compute the IDENTICAL merge table
    * (PipelineSpec forces the ceiling to 0 and asserts equality). */
  private[graft] val t15DriverLocalMaxWords = 8000000L
  /** Which regime the LAST t15 invocation ran ("driver-local" or
    * "distributed") — observability hook for the plan-switch spec,
    * like t12's broadcast-vs-shuffle plan assertion. */
  @volatile private[graft] var t15LastRegime: String = ""

  /** 256 merges REQUESTED — production-shaped relative to round 9's 16,
    * and free in the driver-local regime (per-merge cost ∝ affected
    * words). The synthetic gate corpus has only 31 unique words /
    * 138 chars, so training runs DRY (every word a single token, no
    * adjacent pair left) before the request is met — the trained table
    * is the complete exhaustion prefix, byte-equal to the reference
    * trainer's (PipelineSpec), and a 1000-merge run on a richer
    * synthetic vocabulary is spec'd separately against the naive
    * reference to pin the incremental trainer at real merge counts. */
  def t15BpeTrain(s: SparkSession, d: String): DataFrame =
    t15BpeTrainImpl(s, d, merges = 256, t15DriverLocalMaxWords)

  private[graft] def t15BpeTrainImpl(s: SparkSession, d: String,
                                     merges: Int,
                                     driverLocalMaxWords: Long): DataFrame = {
    import s.implicits._
    // ONE corpus pass: word → count (Heaps-bounded frame)
    val wordFrame = documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .as[(Array[String], Long)]
      .toDF("syms", "cnt")
      .localCheckpoint(true)
    val nWords = wordFrame.count()
    val out =
      if (nWords <= driverLocalMaxWords) {
        t15LastRegime = "driver-local"
        val collected = wordFrame.as[(Array[String], Long)].collect() // bounded: <= driverLocalMaxWords rows (regime guard)
        t15MergeLoopLocal(collected, merges)
      } else {
        t15LastRegime = "distributed"
        t15MergeLoopDistributed(s, wordFrame, merges)
      }
    out.toDF("rank", "left", "right", "cnt", "vocab_size", "pass")
      .orderBy(col("rank"))
  }

  /** Driver-local merge loop with incremental pair-count maintenance:
    * pair counts live in a hash map, the argmax comes off a
    * lazy-deletion heap (stale entries popped until the top matches
    * the live count), and each merge rewrites ONLY the words that
    * contain the pair (tracked per pair), subtracting their old
    * adjacent-pair contributions and adding the new ones. Per-merge
    * cost ∝ affected words, so 50k merges are milliseconds each once
    * the first pass has built the tables. */
  private[graft] def t15MergeLoopLocal(
      wordsIn: Array[(Array[String], Long)], merges: Int)
    : Seq[(Int, String, String, Long, Long, Boolean)] = {
    import scala.collection.mutable
    val words: Array[Array[String]] = wordsIn.map(_._1)
    val cnts: Array[Long] = wordsIn.map(_._2)
    val initVocab = words.iterator.flatten.toSet.size.toLong
    val pairCnt = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def addWordPairs(wid: Int, sign: Long): Unit = {
      val syms = words(wid); val c = cnts(wid)
      var i = 0
      while (i + 1 < syms.length) {
        val p = (syms(i), syms(i + 1))
        val nv = pairCnt.getOrElse(p, 0L) + sign * c
        if (nv == 0L) { pairCnt.remove(p); pairWords.get(p).foreach(_.remove(wid)) }
        else {
          pairCnt(p) = nv
          if (sign > 0) pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wid
        }
        i += 1
      }
      // a negative pass can leave wid in sets for pairs still held by
      // OTHER words; stale membership is re-filtered at merge time
    }
    var wid = 0
    while (wid < words.length) { addWordPairs(wid, +1L); wid += 1 }
    // heap of (count, a, b) snapshots; "max" = highest count, ties by
    // lexicographically SMALLEST pair (matches the distributed
    // orderBy(pc desc, a, b) — corpus is ASCII, so JVM order == Spark
    // binary order)
    val heapOrd: Ordering[(Long, String, String)] =
      Ordering.fromLessThan[(Long, String, String)] { case ((c1, a1, b1), (c2, a2, b2)) =>
        if (c1 != c2) c1 < c2
        else if (a1 != a2) a1 > a2
        else b1 > b2
      }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    pairCnt.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long, Long, Boolean)]
    var prevCnt = Long.MaxValue
    var rank = 1
    while (rank <= merges && heap.nonEmpty) {
      // lazy deletion: pop until the snapshot matches the live count
      var top: (Long, String, String) = null
      while (top == null && heap.nonEmpty) {
        val t = heap.dequeue()
        if (pairCnt.get((t._2, t._3)).contains(t._1)) top = t
      }
      if (top != null) {
        val (c, a, b) = top
        val ok = c >= 1 && c <= prevCnt
        prevCnt = c
        out += ((rank, a, b, c, initVocab + rank, ok))
        val affected = pairWords.getOrElse((a, b), mutable.HashSet.empty)
          .toArray.filter { w =>
            val syms = words(w)
            var i = 0; var found = false
            while (!found && i + 1 < syms.length) {
              if (syms(i) == a && syms(i + 1) == b) found = true; i += 1
            }
            found
          }
        val touched = mutable.HashSet.empty[(String, String)]
        affected.foreach { w =>
          val syms = words(w)
          var i = 0
          while (i + 1 < syms.length) { touched += ((syms(i), syms(i + 1))); i += 1 }
          addWordPairs(w, -1L)
          val nb = mutable.ArrayBuffer.empty[String]
          i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              nb += a + b; i += 2
            } else { nb += syms(i); i += 1 }
          }
          words(w) = nb.toArray
          i = 0
          while (i + 1 < words(w).length) { touched += ((words(w)(i), words(w)(i + 1))); i += 1 }
          addWordPairs(w, +1L)
        }
        touched.foreach { p =>
          pairCnt.get(p).foreach(c2 => heap.enqueue((c2, p._1, p._2)))
        }
        rank += 1
      }
    }
    out.toSeq
  }

  /** Distributed merge loop — the above-ceiling regime: each merge is
    * one map-side-combinable pair-count aggregate over the word frame,
    * a heap top-1 (TakeOrderedAndProject), and a narrow typed map
    * applying the merge; lineage localCheckpoint-truncated every 4
    * merges. Correct at any word-frame size; ~3 Spark jobs per merge,
    * so the driver-local regime is preferred whenever the frame fits. */
  private def t15MergeLoopDistributed(s: SparkSession, wordsIn: DataFrame,
                                      merges: Int)
    : Seq[(Int, String, String, Long, Long, Boolean)] = {
    import s.implicits._
    var words = wordsIn
    val initVocab = words
      .select(explode(col("syms")).as("sym")).distinct().count()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long, Boolean)]
    var prevCnt = Long.MaxValue
    for (rank <- 1 to merges) {
      // adjacent pairs weighted by word count — vocab-bounded aggregate
      val best = words
        .select(col("cnt"), explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
            |         slice(syms, 2, size(syms) - 1),
            |         (x, y) -> struct(x AS a, y AS b))""".stripMargin)).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("a"), col("b"))
        .limit(1).collect() // bounded: limit(1)
      if (best.nonEmpty) {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        val ok = c >= 1 && c <= prevCnt
        prevCnt = c
        out += ((rank, a, b, c, initVocab + rank, ok))
        words = words.as[(Array[String], Long)].map { case (syms, n) =>
          val w = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              w += a + b; i += 2
            } else { w += syms(i); i += 1 }
          }
          (w.toArray, n)
        }.toDF("syms", "cnt")
        if (rank % 4 == 0) words = words.localCheckpoint(true)
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------- T17
  /** T17: BPE tokenizer APPLICATION — the other half of t15: the
    * trained merge table, frozen as a rank map, encodes every document
    * (the "tokenize the corpus" pass that feeds sequence packing /
    * training shuffles). Standard encoder semantics: per word, the
    * LOWEST-RANK adjacent pair present is merged (all its occurrences,
    * left-to-right) until no ranked pair remains — the
    * merges-in-training-order equivalence is asserted in spec by an
    * independent sequential-application reference encoder.
    *
    * Scale: the rank map is vocabulary-bounded (t15's Heaps argument)
    * and BROADCAST; encoding is one narrow mapPartitions — zero
    * shuffle, corpus touched once. A per-partition word→tokens MEMO
    * makes the per-row cost ∝ unique words seen, not tokens (Heaps
    * again: on 100 TB the memo hit-rate approaches 1, so encode runs
    * at scan speed). No SQL oracle (the merge recurrence, like t15) —
    * instead the in-query `pass` gate holds per-document invariants an
    * encoder bug cannot survive: `roundtrip_ok` (the word's tokens
    * concatenate back to the word, char-exact — a dropped/duplicated
    * symbol flips it), `vocab_ok` (every multi-char token is a product
    * of some trained merge — an unranked merge flips it), and
    * n_tok ≤ n_chars. PipelineSpec adds reference-encoder equality. */
  def t17BpeEncode(s: SparkSession, d: String): DataFrame =
    t17BpeEncodeImpl(s, d, merges = 256)

  /** The per-word encode kernel, pure and standalone so the spec can
    * drive it against rich synthetic merge tables: merge the
    * LOWEST-RANK adjacent pair present (all occurrences, left-to-right
    * non-overlapping) until no ranked pair remains. */
  private[graft] def bpeEncodeWord(rk: Map[(String, String), Int],
                                   w: String): Array[String] = {
    var syms: Array[String] = w.split("").filter(_.nonEmpty)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue; var bestA = ""; var bestB = ""
      var i = 0
      while (i + 1 < syms.length) {
        val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestA = syms(i); bestB = syms(i + 1) }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val nb = scala.collection.mutable.ArrayBuffer.empty[String]
        i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == bestA && syms(i + 1) == bestB) {
            nb += bestA + bestB; i += 2
          } else { nb += syms(i); i += 1 }
        }
        syms = nb.toArray
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  private[graft] def t17BpeEncodeImpl(s: SparkSession, d: String,
                                      merges: Int): DataFrame = {
    import s.implicits._
    val mergeTable = t15BpeTrainImpl(s, d, merges, t15DriverLocalMaxWords)
      .select(col("rank"), col("left"), col("right"))
      .as[(Int, String, String)].collect() // bounded: <= merges rows
    val ranks: Map[(String, String), Int] =
      mergeTable.map(t => ((t._2, t._3), t._1)).toMap
    val merged: Set[String] = mergeTable.map(t => t._2 + t._3).toSet
    val ranksB = s.sparkContext.broadcast(ranks)
    val mergedB = s.sparkContext.broadcast(merged)
    documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val rk = ranksB.value; val vocabProducts = mergedB.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        def encodeWord(w: String): Array[String] =
          memo.getOrElseUpdate(w, bpeEncodeWord(rk, w))
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          var nChars = 0L; var nTok = 0L
          var roundtripOk = true; var vocabOk = true
          md.reset()
          words.foreach { w =>
            val toks = encodeWord(w)
            nChars += w.length; nTok += toks.length
            if (toks.mkString != w) roundtripOk = false
            toks.foreach { t =>
              if (t.length > 1 && !vocabProducts.contains(t)) vocabOk = false
              md.update(t.getBytes("UTF-8")); md.update(1.toByte)
            }
            md.update(2.toByte)   // word boundary
          }
          val hash = md.digest().map("%02x".format(_)).mkString
          (id, words.length.toLong, nChars, nTok, hash,
            roundtripOk, vocabOk,
            roundtripOk && vocabOk && nTok <= nChars && nTok >= words.length)
        }
      }
      .toDF("doc_id", "n_words", "n_chars", "n_tok", "tok_hash",
        "roundtrip_ok", "vocab_ok", "pass")
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------- T20
  /** T20: UNIGRAM-LM tokenizer TRAINING — the SentencePiece-family
    * member beside t15's BPE (Kudo 2018): a candidate piece vocabulary
    * is scored by an EM loop that alternates (E) segmenting every word
    * into its maximum-likelihood pieces and (M) re-estimating piece
    * probabilities from the segmentation counts, with a prune step
    * between phases dropping the lowest-evidence multi-char pieces.
    *
    * t15's discipline end-to-end: the corpus is touched EXACTLY ONCE
    * (the word-count aggregate); seeding is one substring aggregate
    * over the Heaps-bounded WORD frame; every EM round iterates the
    * word frame with the piece table riding a broadcast-sized closure
    * (vocabulary ≪ corpus), so 100 TB of text trains at vocabulary
    * cost. Below [[t15DriverLocalMaxWords]] the word frame is collected
    * once and the whole loop runs driver-local; above it each E-step is
    * one map-side-combinable count aggregate over the distributed
    * frame. Both regimes produce the IDENTICAL table: the E-step is
    * HARD EM (Viterbi best segmentation, integer counts — exact under
    * any partitioning/summation order, unlike soft-EM float
    * accumulation), probabilities derive deterministically from those
    * integers, and the per-word Viterbi DP runs on one executor with a
    * fixed association order. PipelineSpec forces the ceiling to 0 and
    * asserts bit-equality.
    *
    * Viterbi tie rule (pinned for the reference spec): on equal score,
    * prefer the LONGER last piece, recursively — i.e. the reverse-
    * lexicographically largest piece-length sequence among optimal
    * segmentations.
    *
    * No SQL oracle (the EM recurrence, like t15's merge loop) — the
    * in-query `pass` gate holds the invariants hard EM must satisfy:
    * corpus Viterbi log-likelihood NON-DECREASING across the EM rounds
    * of each phase (the classification-EM monotonicity theorem — a
    * counting or normalization bug breaks it), every piece count ≥ 1
    * with probabilities summing to 1, every word's segmentation
    * concatenating back to the word char-exact (t17's roundtrip gate),
    * and the final vocabulary within its cap. PipelineSpec adds
    * equality with an independent exhaustive-enumeration reference
    * trainer on overlap-rich synthetics. */
  private[graft] val t20MaxPieceLen = 6
  private[graft] val t20SeedMultis = 1024
  private[graft] val t20TargetMultis = 256
  private[graft] val t20EmRounds = 2 // per phase: 2 before prune, 2 after
  @volatile private[graft] var t20LastRegime: String = ""

  def t20UnigramTrain(s: SparkSession, d: String): DataFrame =
    t20UnigramTrainImpl(s, d, t15DriverLocalMaxWords)

  /** Viterbi best segmentation of one word under piece log-probs —
    * pure and standalone so the reference spec can drive it. Returns
    * None when no segmentation exists (impossible while the alphabet
    * is seeded). Scores accumulate LEFT-TO-RIGHT (best(i−l) + lp), the
    * association order the exhaustive reference mirrors so float
    * near-ties cannot diverge between them. */
  private[graft] def t20Viterbi(word: String, logp: collection.Map[String, Double],
                                maxLen: Int): Option[List[String]] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val bl = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= maxLen && l <= i) {
        if (best(i - l) != Double.NegativeInfinity) {
          logp.get(word.substring(i - l, i)) match {
            case Some(lp) =>
              val sc = best(i - l) + lp
              if (sc > best(i) || (sc == best(i) && l > bl(i))) {
                best(i) = sc; bl(i) = l
              }
            case None =>
          }
        }
        l += 1
      }
      i += 1
    }
    if (best(n) == Double.NegativeInfinity) None
    else {
      var out = List.empty[String]
      var p = n
      while (p > 0) { out = word.substring(p - bl(p), p) :: out; p -= bl(p) }
      Some(out)
    }
  }

  /** One hard-EM E-step over a word iterator: Viterbi-segment each
    * word, accumulate integer piece counts weighted by word count.
    * Returns (counts, roundtrip_ok) — shared by both regimes. */
  private[graft] def t20EStep(words: Iterator[(String, Long)],
                              logp: collection.Map[String, Double],
                              maxLen: Int)
      : (scala.collection.mutable.HashMap[String, Long], Boolean) = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    var rt = true
    words.foreach { case (w, c) =>
      t20Viterbi(w, logp, maxLen) match {
        case Some(pieces) =>
          if (pieces.mkString != w) rt = false
          pieces.foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
        case None => rt = false
      }
    }
    (counts, rt)
  }

  /** The distributed regime's hard-EM E-step over the word frame:
    * per-partition integer counts + a roundtrip flag, folded by ONE
    * map-side-combinable aggregate (integer counts are exact under any
    * partitioning). A partition that emits NO counts — its every word
    * failed to segment — still carries its flag via a zero-count
    * sentinel row ("", 0, rt): without it the aggregate never sees the
    * partition and a FALSE roundtrip flag is silently lost, turning the
    * in-query roundtrip gate into a false pass. Split out of
    * [[t20TrainOf]] so that lost-flag path is unit-testable
    * (PipelineSpec — unreachable end-to-end because the seeded vocab
    * always covers the corpus alphabet, so it must be pinned here). */
  private[graft] def t20EStepDistributed(wordFrame: DataFrame,
                                         logp: Map[String, Double],
                                         maxLen: Int)
      : (Map[String, Long], Boolean) = {
    val s = wordFrame.sparkSession
    import s.implicits._
    val rows = wordFrame.as[(String, Long)]
      .mapPartitions { it =>
        val (c, rt) = t20EStep(it, logp, maxLen)
        if (c.isEmpty) Iterator.single(("", 0L, rt))
        else c.iterator.map { case (p, n) => (p, n, rt) }
      }
      .toDF("piece", "c", "rt")
      .groupBy(col("piece"))
      .agg(sum(col("c")).as("c"), min(col("rt")).as("rt"))
      .collect() // bounded: one row per vocabulary piece
    (rows.filter(_.getLong(1) > 0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap,
      rows.forall(_.getBoolean(2)))
  }

  private[graft] def t20UnigramTrainImpl(s: SparkSession, d: String,
                                         driverLocalMaxWords: Long)
      : DataFrame =
    t20TrainOf(documents(s, d), driverLocalMaxWords)

  /** The trainer body over any (doc_id, text) frame — split out so the
    * exhaustive-reference and regime-equality specs can feed
    * overlap-rich synthetic corpora. */
  private[graft] def t20TrainOf(docs: DataFrame,
                                driverLocalMaxWords: Long): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // ONE corpus pass: the Heaps-bounded word frame
    val wordFrame = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].toDF("w", "cnt")
      .localCheckpoint(true)
    // SEEDING: every substring occurrence up to MaxPieceLen, weighted
    // by word count — an aggregate over the word frame, not the corpus
    val pieceFreq = wordFrame
      .select(explode(expr(
        s"""flatten(transform(sequence(0, length(w) - 1),
           |  i -> transform(sequence(1, least($t20MaxPieceLen, length(w) - i)),
           |                 l -> substring(w, i + 1, l))))""".stripMargin))
        .as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
      .localCheckpoint(true)
    val singles = pieceFreq.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect() // bounded: the corpus alphabet
    val alphabet: Set[String] = singles.map(_._1).toSet
    val multis = pieceFreq.filter(length(col("piece")) > 1)
      .orderBy(col("freq").desc, col("piece"))
      .limit(t20SeedMultis)
      .as[(String, Long)].collect() // bounded: limit(t20SeedMultis) heap top-k
    var vocab: Map[String, Long] = (singles ++ multis).toMap
    val nWords = wordFrame.count()
    val local: Option[Array[(String, Long)]] =
      if (nWords <= driverLocalMaxWords) {
        t20LastRegime = "driver-local"
        Some(wordFrame.as[(String, Long)].collect()) // bounded: <= driverLocalMaxWords rows (regime guard)
      } else { t20LastRegime = "distributed"; None }
    def eStep(logp: Map[String, Double]): (Map[String, Long], Boolean) =
      local match {
        case Some(arr) =>
          val (c, rt) = t20EStep(arr.iterator, logp, t20MaxPieceLen)
          (c.toMap, rt)
        case None =>
          t20EStepDistributed(wordFrame, logp, t20MaxPieceLen)
      }
    def probsOf(counts: Map[String, Long]): Map[String, Double] = {
      val tot = counts.values.sum.toDouble
      counts.map { case (p, c) => p -> math.log(c / tot) }
    }
    // corpus Viterbi log-likelihood from INTEGER counts — deterministic
    def llOf(counts: Map[String, Long]): Double = {
      val tot = counts.values.sum.toDouble
      counts.iterator.map { case (_, c) => c * math.log(c / tot) }.sum
    }
    var logp = probsOf(vocab)
    var roundtripOk = true
    val lls = scala.collection.mutable.ArrayBuffer.empty[Double]
    var counts: Map[String, Long] = Map.empty
    def emPhase(): Unit = (1 to t20EmRounds).foreach { _ =>
      val (c, rt) = eStep(logp)
      roundtripOk &&= rt
      counts = c
      lls += llOf(c)
      logp = probsOf(c) // M-step: MLE over the hard segmentation
    }
    emPhase()
    val llPhase1Monotone = lls(1) >= lls(0) - 1e-6 * math.abs(lls(0))
    // PRUNE to the target: keep the alphabet (segmentability — the
    // SentencePiece character-coverage convention; a dropped char is
    // re-seeded at count 1) + the top multis by evidence
    val keptMultis = counts.toSeq.filter(_._1.length > 1)
      // local: driver-held vocabulary table, ≤ seed size
      .sortBy { case (p, c) => (-c, p) }.take(t20TargetMultis)
    counts = (alphabet.map(a => a -> math.max(counts.getOrElse(a, 0L), 1L))
      ++ keptMultis).toMap
    logp = probsOf(counts)
    val llsBefore = lls.size
    emPhase()
    val llPhase2Monotone =
      lls(llsBefore + 1) >= lls(llsBefore) - 1e-6 * math.abs(lls(llsBefore))
    val probOk = {
      val tot = counts.values.sum.toDouble
      math.abs(counts.values.map(_ / tot).sum - 1.0) < 1e-9 &&
        counts.values.forall(_ >= 1L)
    }
    val pass = llPhase1Monotone && llPhase2Monotone && roundtripOk &&
      probOk && counts.size <= alphabet.size + t20TargetMultis
    val tot = counts.values.sum.toDouble
    val table = counts.toSeq.sortBy { case (p, c) => (-c, p) }.zipWithIndex
      .map { case ((p, c), i) =>
        (i + 1, p, c, c / tot, counts.size.toLong, pass)
      }
    table.toDF("rank", "piece", "cnt", "prob", "vocab_size", "pass")
      .orderBy(col("rank"))
  }

  // ------------------------------------------------------------- T22
  /** T22: UNIGRAM-LM tokenizer APPLICATION — t17's dual for t20,
    * completing the SentencePiece-family pair (t20 trains the piece
    * table, t22 encodes the corpus with it): every document's words
    * are segmented by the SAME Viterbi kernel the trainer's E-step
    * runs ([[t20Viterbi]], identical tie rule — prefer the longer
    * last piece — so an encode is exactly the segmentation the final
    * EM round would have assigned).
    *
    * t17's scale discipline verbatim: the trained table is
    * vocabulary-bounded (alphabet + [[t20TargetMultis]] multis) and
    * BROADCAST; encoding is one narrow mapPartitions — zero shuffle,
    * corpus touched once — with a per-partition word→segmentation MEMO
    * so per-row cost is ∝ unique words seen, not tokens (Heaps: at
    * 100 TB the memo hit rate approaches 1 and encode runs at scan
    * speed). No SQL oracle (the table comes from t20's EM recurrence);
    * the in-query `pass` gate holds what an encoder bug cannot
    * survive: `roundtrip_ok` (pieces concatenate back to the word
    * char-exact), `in_vocab_ok` (every emitted piece is a table key),
    * `seg_ok` (every word segments — the seeded alphabet guarantees
    * it, so a miss means table/broadcast corruption), token-count
    * bounds (n_words ≤ n_tok ≤ n_chars), and the trainer's own `pass`
    * folded in (a failed trainer must not silently feed encode).
    * PipelineSpec adds equality with a driver-side encode under the
    * frozen table. */
  def t22UnigramEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val trained = t20UnigramTrainImpl(s, d, t15DriverLocalMaxWords)
      .select(col("piece"), col("prob"), col("pass"))
      .as[(String, Double, Boolean)]
      .collect() // bounded: vocab-capped piece table (alphabet + t20TargetMultis)
    t22EncodeOf(documents(s, d), trained.map(t => (t._1, t._2)),
      trainerOk = trained.forall(_._3))
  }

  /** The encode body over any (doc_id, text) frame and frozen
    * (piece, prob) table — split out so the reference spec can drive
    * synthetic tables and corpora against a driver-side encode. */
  private[graft] def t22EncodeOf(docs: DataFrame,
                                 table: Seq[(String, Double)],
                                 trainerOk: Boolean = true): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val logp: Map[String, Double] =
      table.map { case (p, pr) => p -> math.log(pr) }.toMap
    // derived from the table, not pinned to t20MaxPieceLen: the kernel
    // stays standalone-correct for any synthetic table the spec feeds
    val maxLen = if (logp.isEmpty) 1 else logp.keysIterator.map(_.length).max
    val lpB = s.sparkContext.broadcast(logp)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val lp = lpB.value
        val memo = scala.collection.mutable
          .HashMap.empty[String, Option[List[String]]]
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          var nChars = 0L; var nTok = 0L
          var rt = true; var inVocab = true; var seg = true
          md.reset()
          words.foreach { w =>
            nChars += w.length
            memo.getOrElseUpdate(w, t20Viterbi(w, lp, maxLen)) match {
              case Some(pieces) =>
                nTok += pieces.length
                if (pieces.mkString != w) rt = false
                pieces.foreach { p =>
                  if (!lp.contains(p)) inVocab = false
                  md.update(p.getBytes("UTF-8")); md.update(1.toByte)
                }
              case None => seg = false
            }
            md.update(2.toByte) // word boundary
          }
          val hash = md.digest().map("%02x".format(_)).mkString
          (id, words.length.toLong, nChars, nTok, hash, rt, inVocab, seg,
            trainerOk && rt && inVocab && seg &&
              nTok <= nChars && nTok >= words.length)
        }
      }
      .toDF("doc_id", "n_words", "n_chars", "n_tok", "piece_hash",
        "roundtrip_ok", "in_vocab_ok", "seg_ok", "pass")
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------- T16
  /** T16: model-based quality FILTER inference — the learned-classifier
    * stage (fastText/DCLM-style) that sits beside the rule-based
    * filters (t2 ratios, t13 Gopher rules): hashing-trick features
    * (md5 of each token mod 4096 — the stable-across-engines variant
    * of the murmur trick) scored by a linear model, keep = positive
    * score. The weight vector is a pure integer FORMULA of the feature
    * index (Knuth-hash spread over [−2048, 2047]) rather than a
    * trained table, which keeps the whole query a zero-shuffle
    * codegen'd projection AND gives the score an exact integer SQL
    * twin; a production model swaps the formula for a broadcast
    * weights array with the identical plan shape (t12's
    * broadcast-below-ceiling discipline if the vocab outgrows it).
    *
    * Scale: one narrow pass, no explode reaching any exchange, no UDF,
    * no float anywhere — the filter runs at scan speed on 100 TB. */
  def t16QualityModel(s: SparkSession, d: String): DataFrame = {
    // weight(idx) = ((idx * 2654435761) mod 4096) − 2048, idx = first 8
    // md5 hex digits mod 4096 — both integer-exact in Spark and DuckDB
    val scoreExpr = expr(
      """aggregate(split(text, ' '),
        |  0L,
        |  (acc, w) -> acc + CASE WHEN length(w) = 0 THEN 0L
        |    ELSE ((cast(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT) % 4096)
        |          * 2654435761L) % 4096 - 2048 END)""".stripMargin)
    documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        scoreExpr.as("score_int"))
      .withColumn("keep", col("score_int") > 0)
      .orderBy(col("doc_id"))
  }

  val t16Sql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |  CAST(list_sum(list_transform(string_split(text, ' '),
      |    w -> CASE WHEN length(w) = 0 THEN 0
      |      ELSE ((CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % 4096)
      |            * 2654435761) % 4096 - 2048 END)) AS BIGINT) AS score_int,
      |  list_sum(list_transform(string_split(text, ' '),
      |    w -> CASE WHEN length(w) = 0 THEN 0
      |      ELSE ((CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % 4096)
      |            * 2654435761) % 4096 - 2048 END)) > 0 AS keep
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- T18
  /** T18: cross-document n-gram NOVELTY profile — for each document,
    * how much of its 8-gram content is unique to it vs shared with any
    * other document in the corpus. The per-doc dual of the dedup
    * family: p1/x11 find WHICH documents overlap; t18 scores HOW
    * original each document is (novelty in basis points), the signal
    * used to pick "high-novelty" subsets for curriculum/quality
    * mixtures and to flag template farms (novelty ≈ 0) before they
    * reach near-dup clustering.
    *
    * Scale: reuses x12's narrow distinct-gram projection (one corpus
    * pass, no shuffle); gram frequencies are ONE map-side-combined
    * aggregate on the gram (grams are distinct per doc, so COUNT(*) =
    * containing-doc count); the per-doc fold is a shuffle join of the
    * gram frame against the (gram, count) dictionary — output is
    * \|grams\| rows regardless of how viral a gram is, so a hot
    * boilerplate gram inflates no partition (the dictionary side of a
    * skewed key is ONE row; AQE handles the probe-side spread).
    * Integer basis points ⇒ hash-exact. */
  def t18NgramNovelty(s: SparkSession, d: String): DataFrame = {
    val grams = Dedup.decontamGramsOf(documents(s, d))
    val freq = grams.groupBy(col("g")).agg(count(lit(1)).as("n_docs"))
    grams.join(freq, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_docs") >= 2L, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("novelty_bp",
        expr("(n_grams - n_shared) * 10000 DIV n_grams"))
      .orderBy(col("doc_id"))
  }

  val t18Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |             array_to_string(list_slice(ws, i, i + 7), ' ') AS g
      |      FROM w, unnest(generate_series(1, len(ws) - 7)) AS u(i)
      |      WHERE len(ws) >= 8),
      |f AS (SELECT g, COUNT(*) AS n_docs FROM g GROUP BY 1)
      |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |       CAST(COUNT(*) FILTER (f.n_docs >= 2) AS BIGINT) AS n_shared,
      |       CAST((COUNT(*) - COUNT(*) FILTER (f.n_docs >= 2)) * 10000
      |            // COUNT(*) AS BIGINT) AS novelty_bp
      |FROM g JOIN f USING (g)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- T19
  /** T19: per-document KEYWORD extraction — the top-3 TF-IDF terms of
    * every document, the classic "what is this doc about" signal used
    * for topic tagging, cluster labeling (x29's clusters get names from
    * exactly this), and retrieval snippets. t11's BM25 scores docs
    * against a QUERY; t19 ranks a doc's own terms against the corpus.
    *
    * The idf is INTEGER-portable by construction: score =
    * tf · ((N·10⁴) DIV df) — a monotone transform of tf·N/df, so the
    * ranking is the classic TF-IDF ranking, but every intermediate is
    * a long and the whole query hash-matches across engines (no ln, no
    * float; the t13/x25 discipline). Bounds: tf ≤ doc tokens ≤ 10⁴-ish,
    * N·10⁴ DIV df ≤ N·10⁴ — products stay far inside int64 until
    * N ≈ 10¹⁴ docs.
    *
    * Scale: one tokenize pass → map-side-combined (doc, term) tf; df
    * folds FROM the tf frame (terms are distinct per (doc, term) row ⇒
    * COUNT(*) = containing docs — t18's dictionary trick) so the
    * corpus is never re-read; tf ⋈ df joins on the Heaps-bounded vocab
    * frame (dictionary side of a hot term is ONE row, AQE spreads the
    * probe); the per-doc top-3 is a rank-≤-3 filter — WindowGroupLimit
    * keeps 3 rows per doc, no global sort. N is a 1-row broadcast. */
  def t19KeywordExtract(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = documents(s, d)
      .select(col("doc_id"), explode(split(norm, " +")).as("term"))
      .filter(length(col("term")) > 0)
    // tf feeds THREE consumers (df fold, N count, the scoring join) —
    // materialize it once so the corpus tokenize+aggregate runs once,
    // not three times (x23's histogram-frame treatment)
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = tf.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(n)) // bounded: n is ONE row
      .withColumn("score", col("tf") * expr("(n_docs * 10000) DIV df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val t19Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
      |       WHERE len(term) > 0 GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |         tf.tf * ((n.n_docs * 10000) // df.df) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, CAST(rnk AS INT) AS rnk, term, tf, df, score FROM (
      |  SELECT doc_id, term, tf, df, score,
      |         ROW_NUMBER() OVER (PARTITION BY doc_id
      |                            ORDER BY score DESC, term) AS rnk
      |  FROM scored) t
      |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t22_unigram_encode" -> (t22UnigramEncode _),
    "t20_unigram_train" -> (t20UnigramTrain _),
    "t19_keyword_extract" -> (t19KeywordExtract _),
    "t18_ngram_novelty" -> (t18NgramNovelty _),
    "x25_data_card" -> (x25DataCard _),
    "t17_bpe_encode" -> (t17BpeEncode _),
    "t16_quality_model" -> (t16QualityModel _),
    "t15_bpe_train" -> (t15BpeTrain _),
    "t14_chunk" -> (t14Chunk _),
    "t13_gopher_quality" -> (t13GopherQuality _),
    "t12_lm_perplexity" -> (t12LmPerplexity _),
    "t21_kn_perplexity" -> (t21KnPerplexity _),
    "t11_bm25_search" -> (t11Bm25Search _),
    "t10_pii_redact" -> (t10PiiRedact _),
    "t9_vocab"       -> (t9Vocab _),
    "t8_tfidf"       -> (t8TfIdf _),
    "t1_langid"      -> (t1LangId _),
    "t2_quality"     -> (t2Quality _),
    "t3_token_count" -> (t3TokenCount _),
    "t4_fingerprint" -> (t4Fingerprint _),
    "t5_normalize"   -> (t5Normalize _),
    "t6_sample"      -> (t6StratifiedSample _),
    "t7_repetition"  -> (t7Repetition _),
    "x7_heavy_hitters" -> (x7HeavyHitters _))

  val oracles: Map[String, String] = Map(
    "t19_keyword_extract" -> t19Sql,
    "t18_ngram_novelty" -> t18Sql,
    "x25_data_card" -> x25Sql,
    "t16_quality_model" -> t16Sql,
    "t14_chunk" -> t14Sql,
    "t13_gopher_quality" -> t13Sql,
    "t11_bm25_search" -> t11Sql,
    "t10_pii_redact" -> t10Sql,
    "t9_vocab"       -> t9Sql,
    "t8_tfidf"       -> t8Sql,
    "x7_heavy_hitters" -> x7Sql,
    "t1_langid"      -> t1Sql,
    "t2_quality"     -> t2Sql,
    "t3_token_count" -> t3Sql,
    "t4_fingerprint" -> t4Sql,
    "t5_normalize"   -> t5Sql,
    "t6_sample"      -> t6Sql,
    "t7_repetition"  -> t7Sql)
}
