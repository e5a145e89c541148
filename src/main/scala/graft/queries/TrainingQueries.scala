package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Bpe, Dsir, Packing, Pretrain, Splits, TextAnalysis}
import graft.io.Sources

/** Training-data pipeline operators beyond the round-2 surface: sequence
  * packing layout, stratified deterministic sampling, intra-doc repetition
  * scoring, and the mergeable-sketch percentile path — each oracle-checked.
  */
object TrainingQueries extends QueryGroup {

  private val PackBudget = 512
  private val PackShards = 8

  /** GPT-style packing layout (ext/Packing): which training sequences each
    * document occupies after per-shard concat-and-chunk at a 512-token
    * budget. */
  private def packSequences(s: SparkSession, dir: String): DataFrame =
    Packing.packPlan(Sources.table(s, dir, "documents"),
        budget = PackBudget, shards = PackShards)
      .orderBy("doc_id")

  private val packSequencesOracle: String =
    s"""WITH d AS (SELECT doc_id,
       |  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
       |  FROM documents)
       |, t AS (SELECT doc_id, doc_id % $PackShards AS shard,
       |        len(string_split(norm, ' ')) AS n_tokens FROM d)
       |, c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY shard
       |          ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t)
       |SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(floor((cum - n_tokens) / $PackBudget) AS BIGINT) AS seq_first,
       |  CAST(floor((cum - 1) / $PackBudget) AS BIGINT) AS seq_last,
       |  CAST(floor((cum - 1) / $PackBudget)
       |     - floor((cum - n_tokens) / $PackBudget) + 1 AS BIGINT) AS n_seqs
       |FROM c ORDER BY doc_id""".stripMargin

  /** Stratified deterministic sampling over events: keep every rare
    * purchase, thin the common views — per-stratum hash-bucket keep
    * percentages (ext/Splits.stratifiedSample). */
  private val StratPcts = Map("purchase" -> 100, "click" -> 40, "view" -> 10)
  private val StratDefault = 25
  private def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Splits.stratifiedSample(Sources.table(s, dir, "events"),
        keyCol = "event_id", stratumCol = "event_type",
        pcts = StratPcts, defaultPct = StratDefault)
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")

  private val stratifiedSampleOracle: String = {
    val arms = StratPcts.toSeq.sortBy(_._1).map { case (k, p) =>
      s"WHEN '$k' THEN $p"
    }.mkString(" ")
    s"""SELECT event_id, user_id, event_type FROM events
       |WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
       |        % 100
       |  < CASE event_type $arms ELSE $StratDefault END
       |ORDER BY event_id""".stripMargin
  }

  /** Intra-doc repetition signals (TextAnalysis.repetition): duplicate
    * 3-gram share and top-gram share per document. */
  private def textRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetition(Sources.table(s, dir, "documents"))
      .orderBy("doc_id")

  private val textRepetitionOracle: String =
    """WITH d AS (SELECT doc_id,
      |  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      |  FROM documents)
      |, g AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS gram
      |  FROM (SELECT doc_id, toks,
      |          unnest(range(1, greatest(len(toks)-2, 0)+1)) AS i
      |        FROM (SELECT doc_id, string_split(norm, ' ') AS toks FROM d)
      |        WHERE len(toks) >= 3))
      |, gc AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g
      |         GROUP BY doc_id, gram)
      |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
      |  CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / SUM(cnt) AS dup_gram_ratio,
      |  CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_gram_ratio
      |FROM gc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Approximate percentiles with the bound AS DATA (the a_approx_distinct
    * pattern): approx_percentile is the mergeable-sketch quantile path —
    * fixed memory per group, one pass, vs exact percentiles' per-group
    * sort. The sketch's rank-error guarantee (1/accuracy = 1e-4 here) is
    * verified in-plan: the approximate p50/p95 must land between the exact
    * quantiles at q ± 0.02; DuckDB asserts the same rows with literal
    * TRUE, so the row hash-matches iff the sketch held its bound.
    * (Contract: value is non-null — an all-null group would yield a null
    * comparison, not TRUE.) */
  private def approxPercentile(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(col("value")).as("n_values"),
        expr("approx_percentile(value, 0.5, 10000)")
          .between(expr("percentile(value, 0.48)"),
            expr("percentile(value, 0.52)"))
          .as("p50_within_rank_bound"),
        expr("approx_percentile(value, 0.95, 10000)")
          .between(expr("percentile(value, 0.93)"),
            expr("percentile(value, 0.97)"))
          .as("p95_within_rank_bound"))
      .orderBy("event_type")

  private val approxPercentileOracle: String =
    """SELECT event_type, COUNT(value) AS n_values,
      |       TRUE AS p50_within_rank_bound, TRUE AS p95_within_rank_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The composed curation pipeline (ext/Pretrain): quality gate →
    * language filter → exact dedup keep-min → split assignment, one scan
    * and one exchange end-to-end; the oracle composes the per-stage SQL
    * the individual queries already verify. */
  private def pipelinePretrain(s: SparkSession, dir: String): DataFrame =
    Pretrain.curate(Sources.table(s, dir, "documents"))
      .orderBy("doc_id")

  private val pipelinePretrainOracle: String = {
    val langScores = TextAnalysis.langScoreSql
      .map { case (l, sql) => s"$sql AS score_$l" }.mkString(",\n    ")
    val enStop = TextAnalysis.langScoreSql.find(_._1 == "en").get._2
    s"""WITH d AS (SELECT doc_id,
       |  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
       |  FROM documents)
       |, q AS (SELECT doc_id, norm,
       |    CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens,
       |    $enStop AS stop_hits,
       |    $langScores
       |  FROM d)
       |, gated AS (SELECT doc_id, norm, n_tokens FROM q
       |    WHERE n_tokens >= 10
       |      AND least(n_tokens / 100.0, 1.0) * 0.5
       |        + least(stop_hits / n_tokens * 5.0, 1.0) * 0.5 >= 0.5
       |      AND (${TextAnalysis.langCaseSql}) = 'en')
       |, dd AS (SELECT doc_id, n_tokens,
       |    MIN(doc_id) OVER (PARTITION BY md5(norm)) AS keep_id FROM gated)
       |SELECT doc_id, n_tokens,
       |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, n_tokens,
       |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |          % 100 AS b
       |      FROM dd WHERE doc_id = keep_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** BPE training, round 1 (ext/Bpe): weighted adjacent-pair counts over the
    * char-split word table — the per-round aggregate the trainer argmaxes.
    * Verifying the pair statistic cross-engine pins the half of BPE that IS
    * SQL-expressible; the iterative merge loop itself is spec-verified
    * against an independent sequential reimplementation (BpeSpec). Top 50
    * under a total order, so ties can't flap the cut. */
  private def bpePairs(s: SparkSession, dir: String): DataFrame = {
    val wc = Bpe.wordCounts(Sources.table(s, dir, "documents"))
    wc.select(col("cnt"),
        explode(Bpe.adjacentPairs(Bpe.initTokens(col("word")))).as("p"))
      .groupBy(col("p.a").as("pa"), col("p.b").as("pb"))
      .agg(sum(col("cnt")).cast("bigint").as("pair_cnt"))
      .orderBy(col("pair_cnt").desc, col("pa").asc, col("pb").asc)
      .limit(50)
  }

  private val bpePairsOracle: String =
    s"""WITH d AS (SELECT
       |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
       |  FROM documents)
       |, w AS (SELECT word
       |    FROM (SELECT unnest(string_split(norm, ' ')) AS word FROM d)
       |    WHERE regexp_full_match(word, '[a-z]+'))
       |, pos AS (SELECT word, unnest(range(1, length(word) + 1)) AS i FROM w)
       |, p AS (SELECT substring(word, i, 1) AS pa,
       |    CASE WHEN i < length(word) THEN substring(word, i + 1, 1)
       |         ELSE '${Bpe.Eow}' END AS pb
       |  FROM pos)
       |SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS pair_cnt
       |FROM p GROUP BY pa, pb
       |ORDER BY pair_cnt DESC, pa ASC, pb ASC LIMIT 50""".stripMargin

  /** Sparse TF-IDF cosine pairs via the inverted index (ext/TextAnalysis
    * .sparseCosinePairs). Constants are shared with the oracle below so the
    * engines can never disagree about the pruning/rounding contract. */
  private val CosMaxDf = 50
  private val CosScale = 10000
  private val CosMin = 0.30
  private def sparseCosine(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sparseCosinePairs(TextAnalysis.sharedTokens(s, dir),
      maxDf = CosMaxDf, scale = CosScale, minCosine = CosMin)

  private val sparseCosineOracle: String =
    s"""WITH d AS (SELECT doc_id,
       |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
       |  FROM documents)
       |, tf AS (SELECT doc_id, tok, COUNT(*) AS tf
       |    FROM (SELECT doc_id, unnest(string_split(norm, ' ')) AS tok
       |          FROM d)
       |    WHERE length(tok) > 0 GROUP BY doc_id, tok)
       |, nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
       |, wts AS (SELECT doc_id, tok, df,
       |      CAST(tf * round(ln(n_docs / df) * $CosScale) AS BIGINT) AS w
       |    FROM (SELECT *, COUNT(*) OVER (PARTITION BY tok) AS df FROM tf),
       |         nn
       |    WHERE df <= $CosMaxDf)
       |, norms AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2
       |    FROM wts GROUP BY doc_id)
       |, dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |      CAST(SUM(a.w * b.w) AS BIGINT) AS dot
       |    FROM wts a JOIN wts b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |    GROUP BY doc_a, doc_b)
       |SELECT * FROM (
       |  SELECT doc_a, doc_b,
       |    round(dot / (sqrt(CAST(na.n2 AS DOUBLE))
       |               * sqrt(CAST(nb.n2 AS DOUBLE))), 4) AS cosine
       |  FROM dots
       |  JOIN norms na ON dots.doc_a = na.doc_id
       |  JOIN norms nb ON dots.doc_b = nb.doc_id)
       |WHERE cosine >= $CosMin
       |ORDER BY cosine DESC, doc_a ASC, doc_b ASC""".stripMargin

  /** Self-trained bigram surprisal per document — the LM-based quality
    * signal (CCNet-style perplexity filtering, public knowledge): low mean
    * surprisal ⇒ repetitive/templated text, high ⇒ rare constructions.
    * The model is the corpus's own bigram table; every observed bigram has
    * c12 ≥ 1 so no smoothing branch exists to diverge on.
    *
    * Determinism: per-bigram surprisal is SCALED-INTEGER
    * (round(ln(c1/c12)·10⁶)), so per-doc totals are exact BIGINT sums —
    * independent of accumulation order, the same trick as
    * sim_sparse_cosine. The only float ops are one ln per bigram TYPE and
    * one final division per doc.
    *
    * Scale: the model is Heaps-law bounded (bigram TYPES, not tokens) —
    * Catalyst broadcasts it here, so the scoring side never exchanges at
    * all; past the broadcast threshold the shuffle join keys on exactly
    * the (w1, w2) partitioning the model aggregate produced. c1 rides the
    * model via a window, never a second corpus pass. The corpus-side pair
    * subtree is evaluated for both the model build and the scoring pass —
    * in a real deployment the model is trained ONCE and persisted as an
    * artifact; re-deriving it in-query keeps this self-contained. */
  private def bigramSurprisal(s: SparkSession, dir: String): DataFrame =
    docSurprisal(s, dir).orderBy("doc_id")

  /** Per-doc surprisal scores, unordered (shared by the reporting query
    * and the percentile gate). */
  private def docSurprisal(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = TextAnalysis.sharedTokens(s, dir)
      .filter(size(col("toks")) >= 2)
    val pairs = base
      .select(col("doc_id"), explode(Bpe.adjacentPairs(col("toks"))).as("p"))
      .select(col("doc_id"), col("p.a").as("w1"), col("p.b").as("w2"))
    val model = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .withColumn("c1",
        sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .withColumn("sps",
        round(log(col("c1").cast("double") / col("c12")) * 1e6)
          .cast("long"))
      .select(col("w1"), col("w2"), col("sps"))
    pairs.join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("sps")).as("surprisal_scaled"))
      .withColumn("avg_surprisal",
        round(col("surprisal_scaled") / col("n_bigrams") / 1e6, 6))
  }

  /** CCNet-style perplexity-bucket gate: per SOURCE, keep the
    * low-surprisal half of documents (the "head/middle" cut — templated
    * and fluent text stays, rare-construction tails go to review). The
    * cut is an exact discrete median via row position against the doubled
    * rank (rn·2 ≤ n+1 keeps ⌈n/2⌉), not percentile interpolation — ties
    * break on doc_id so the kept set is identical in any engine and
    * under any partitioning.
    *
    * Row positions via [[graft.ops.PrefixSum.groupedRunningSum]], not a
    * `PARTITION BY source` window: a handful of sources would funnel the
    * whole (corpus-sized) scored table through as many tasks (the
    * a_weighted_median rationale). The scored table is Scratch-persisted
    * so the per-source count job and the prefix pass share one
    * materialization of the expensive surprisal join. */
  private def surprisalGate(s: SparkSession, dir: String): DataFrame = {
    val scored = graft.ops.Scratch.persist(
      docSurprisal(s, dir).join(
        Sources.table(s, dir, "documents").select("doc_id", "source"),
        Seq("doc_id")))
    val counts = broadcast(scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n")))
    graft.ops.PrefixSum.groupedRunningSum(
        scored.withColumn("one", lit(1L)), Seq("source"),
        Seq(col("avg_surprisal").asc, col("doc_id").asc), "one", "rn")
      .join(counts, "source")
      .filter(col("rn") * 2 <= col("n") + 1)
      .select("doc_id", "source", "avg_surprisal")
      .orderBy("doc_id")
  }

  private val surprisalGateOracle: String =
    """WITH d AS (SELECT doc_id,
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      |  FROM documents)
      |, t AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM d
      |        WHERE len(string_split(norm, ' ')) >= 2)
      |, p AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      |    FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
      |          FROM t))
      |, m AS (SELECT w1, w2, COUNT(*) AS c12 FROM p GROUP BY w1, w2)
      |, ms AS (SELECT w1, w2,
      |    CAST(round(ln(CAST(SUM(c12) OVER (PARTITION BY w1) AS DOUBLE)
      |                  / c12) * 1000000) AS BIGINT) AS sps
      |  FROM m)
      |, sc AS (SELECT doc_id,
      |    round(CAST(SUM(sps) AS DOUBLE) / COUNT(*) / 1000000, 6)
      |      AS avg_surprisal
      |  FROM p JOIN ms USING (w1, w2) GROUP BY doc_id)
      |, r AS (SELECT sc.doc_id, doc.source, sc.avg_surprisal,
      |    row_number() OVER (PARTITION BY doc.source
      |      ORDER BY sc.avg_surprisal ASC, sc.doc_id ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY doc.source) AS n
      |  FROM sc JOIN documents doc USING (doc_id))
      |SELECT doc_id, source, avg_surprisal FROM r
      |WHERE rn * 2 <= n + 1 ORDER BY doc_id""".stripMargin

  /** CCNet's corpus partitioning (Wenzek et al. 2020): equal-count
    * head/middle/tail buckets over the per-doc LM surprisal — head =
    * most fluent third, tail = rare-construction third; pretraining
    * recipes consume the buckets directly (e.g. head-only, or
    * temperature-weighted by bucket). The global rank rides
    * [[graft.ops.GlobalIndex]] (range-partitioned sort + zipWithIndex),
    * NOT `row_number() OVER ()` whose empty PARTITION BY funnels the
    * corpus through one reducer; bucket id is the a_equidepth_bins
    * integer arithmetic ((rank−1)·3 div n) — not ntile, whose remainder
    * distribution differs across engines. */
  private def ccnetBuckets(s: SparkSession, dir: String): DataFrame = {
    val scored = docSurprisal(s, dir)
      .select(col("doc_id"), col("avg_surprisal"))
    val idx = graft.ops.GlobalIndex.withRowId(scored,
      Seq(col("avg_surprisal"), col("doc_id")))
    val n = broadcast(idx.agg(count(lit(1)).as("_n")))
    idx.crossJoin(n)
      .select(col("doc_id"), col("avg_surprisal"),
        expr("CASE CAST(((row_id - 1) * 3) div _n AS INT) " +
          "WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END")
          .as("bucket"))
      .orderBy("doc_id")
  }

  private val ccnetBucketsOracle: String =
    """WITH d AS (SELECT doc_id,
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      |  FROM documents)
      |, t AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM d
      |        WHERE len(string_split(norm, ' ')) >= 2)
      |, p AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      |    FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
      |          FROM t))
      |, m AS (SELECT w1, w2, COUNT(*) AS c12 FROM p GROUP BY w1, w2)
      |, ms AS (SELECT w1, w2,
      |    CAST(round(ln(CAST(SUM(c12) OVER (PARTITION BY w1) AS DOUBLE)
      |                  / c12) * 1000000) AS BIGINT) AS sps
      |  FROM m)
      |, sc AS (SELECT doc_id,
      |    round(CAST(SUM(sps) AS DOUBLE) / COUNT(*) / 1000000, 6)
      |      AS avg_surprisal
      |  FROM p JOIN ms USING (w1, w2) GROUP BY doc_id)
      |, r AS (SELECT doc_id, avg_surprisal,
      |    row_number() OVER (ORDER BY avg_surprisal ASC, doc_id ASC) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM sc)
      |SELECT doc_id, avg_surprisal,
      |  CASE CAST(((rn - 1) * 3) // n AS INTEGER)
      |    WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
      |FROM r ORDER BY doc_id""".stripMargin

  private val bigramSurprisalOracle: String =
    """WITH d AS (SELECT doc_id,
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      |  FROM documents)
      |, t AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM d
      |        WHERE len(string_split(norm, ' ')) >= 2)
      |, p AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      |    FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
      |          FROM t))
      |, m AS (SELECT w1, w2, COUNT(*) AS c12 FROM p GROUP BY w1, w2)
      |, ms AS (SELECT w1, w2,
      |    CAST(round(ln(CAST(SUM(c12) OVER (PARTITION BY w1) AS DOUBLE)
      |                  / c12) * 1000000) AS BIGINT) AS sps
      |  FROM m)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(sps) AS BIGINT) AS surprisal_scaled,
      |  round(CAST(SUM(sps) AS DOUBLE) / COUNT(*) / 1000000, 6)
      |    AS avg_surprisal
      |FROM p JOIN ms USING (w1, w2)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Domain mixing weights: per-source token shares and the resampling
    * weight that would equalize source contributions (uniform target; any
    * target vector is the same arithmetic). The global totals ride as
    * window aggregates OVER the per-source frame — cardinality = #sources,
    * so the single-partition window costs nothing at any corpus scale and
    * the corpus itself is scanned exactly once. All ratios are single
    * divisions of exact BIGINTs (identical doubles in both engines). */
  private def mixWeights(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSource = TextAnalysis.sharedTokens(s, dir)
      .select(col("source"), size(col("toks")).cast("long").as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val w = Window.partitionBy()
    perSource
      .withColumn("total_tokens", sum(col("n_tokens")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("total_tokens"), 6).as("token_share"),
        round(col("total_tokens") / (col("k") * col("n_tokens")), 6)
          .as("mix_weight"))
      .orderBy("source")
  }

  private val mixWeightsOracle: String =
    """WITH t AS (SELECT source,
      |    len(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
      |        'g')), ' ')) AS n_toks
      |  FROM documents)
      |, s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens FROM t GROUP BY source)
      |SELECT source, n_docs, n_tokens,
      |  round(CAST(n_tokens AS DOUBLE)
      |      / CAST(SUM(n_tokens) OVER () AS DOUBLE), 6) AS token_share,
      |  round(CAST(SUM(n_tokens) OVER () AS DOUBLE)
      |      / CAST(COUNT(*) OVER () * n_tokens AS DOUBLE), 6) AS mix_weight
      |FROM s ORDER BY source""".stripMargin

  /** Exact-token-budget subsample: "give me N tokens sampled uniformly"
    * — docs ordered by a salted hash (uniform, deterministic, unseeded-
    * rand-free like every split here), cumulative token count via the
    * distributed [[graft.ops.PrefixSum]], keep while the RUNNING total
    * (inclusive) stays within budget plus the first overflowing doc's
    * tokens are excluded — so the kept set is the unique prefix of the
    * hash order whose total is ≤ budget. The oracle is the single-
    * reducer window SUM over the same order. */
  private def tokenBudgetSample(s: SparkSession, dir: String): DataFrame = {
    val budget = 15000L
    val scored = Sources.scatter(Sources.table(s, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.tokens(TextAnalysis.normalize(col("text"))))
            .cast("long").as("n_toks")))
      .withColumn("h", md5(concat(lit("budget-v1:"),
        col("doc_id").cast("string"))))
    graft.ops.PrefixSum.runningSum(scored, Seq(col("h")), "n_toks",
        "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("n_toks"), col("cum_tokens"))
      .orderBy("doc_id")
  }

  private val tokenBudgetOracle: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(trim(regexp_replace(lower(text), '\s+',
      |        ' ', 'g')), ' ')) AS BIGINT) AS n_toks,
      |    md5('budget-v1:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents)
      |, r AS (SELECT doc_id, n_toks,
      |    CAST(SUM(n_toks) OVER (ORDER BY h ASC) AS BIGINT) AS cum_tokens
      |  FROM t)
      |SELECT doc_id, n_toks, cum_tokens FROM r
      |WHERE cum_tokens <= 15000 ORDER BY doc_id""".stripMargin

  /** Temperature-scaled language resampling (mC4/XLM-R α-sampling):
    * q_l ∝ p_l^α flattens the language distribution (α < 1 upweights
    * low-resource languages); sample_weight is the per-DOC multiplier
    * q_l/p_l a weighted sampler applies. #languages-cardinality table
    * math after one corpus scan; the p^α power and the q normalization
    * are the only floats, computed identically from exact BIGINTs. */
  private def langTemperature(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alpha = 0.3
    val perLang = Sources.scatter(Sources.table(s, dir, "documents")
        .select(col("lang"),
          size(TextAnalysis.tokens(TextAnalysis.normalize(col("text"))))
            .cast("long").as("n_toks")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val w = Window.partitionBy()
    perLang
      .withColumn("p", col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(w).cast("double"))
      .withColumn("pa", pow(col("p"), lit(alpha)))
      .withColumn("q", col("pa") / sum(col("pa")).over(w))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("p"), 6).as("token_share"),
        round(col("q"), 6).as("target_share"),
        round(col("q") / col("p"), 6).as("sample_weight"))
      .orderBy("lang")
  }

  private val langTemperatureOracle: String =
    """WITH t AS (SELECT lang,
      |    CAST(len(string_split(trim(regexp_replace(lower(text), '\s+',
      |        ' ', 'g')), ' ')) AS BIGINT) AS n_toks
      |  FROM documents)
      |, s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens FROM t GROUP BY lang)
      |, p AS (SELECT *, CAST(n_tokens AS DOUBLE)
      |      / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS p FROM s)
      |, q AS (SELECT *, pow(p, 0.3) AS pa FROM p)
      |SELECT lang, n_docs, n_tokens,
      |  round(p, 6) AS token_share,
      |  round(pa / SUM(pa) OVER (), 6) AS target_share,
      |  round(pa / SUM(pa) OVER () / p, 6) AS sample_weight
      |FROM q ORDER BY lang""".stripMargin

  /** DSIR importance weights: target = the English-labeled docs, raw =
    * the whole corpus. On this fixture the languages share one token
    * pool (the NaiveBayesText honesty note), so the weight SPREAD is
    * modest by construction — the query pins the hashed-bigram model
    * and micro-nat scoring arithmetic cross-engine, not selection
    * skill. */
  private def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    // feed DSIR the STAGED token table (shared with the bm25/tfidf/
    // surprisal/ccnet family) joined with the predicate column — the
    // tokenize-once contract; the lang side is a broadcast-sized
    // projection of the same corpus
    val withLang = graft.ext.TextAnalysis.sharedTokens(s, dir)
      .join(Sources.table(s, dir, "documents").select("doc_id", "lang"),
        "doc_id")
    Dsir.importanceWeights(withLang, col("lang") === "en")
    // no ORDER BY (the setsim/decode precedent): the sort's range-sample
    // pass would re-execute the zipWithIndex selection chain a second
    // time for presentation order the differential compare doesn't need
  }

  private val dsirOracle: String =
    """WITH d AS (SELECT doc_id, lang,
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      |  FROM documents)
      |, t AS (SELECT doc_id, (lang = 'en') AS is_target,
      |    string_split(norm, ' ') AS toks FROM d)
      |, bg AS (SELECT doc_id, is_target, toks[i] || ' ' || toks[i+1] AS bigram
      |  FROM (SELECT doc_id, is_target, toks,
      |          unnest(range(1, len(toks))) AS i
      |        FROM t WHERE len(toks) >= 2))
      |, sl AS (SELECT doc_id, is_target,
      |    ('0x' || substr(md5(bigram), 1, 8))::BIGINT % 64 AS slot FROM bg)
      |, ds AS (SELECT doc_id, slot, CAST(COUNT(*) AS BIGINT) AS cnt
      |         FROM sl GROUP BY 1, 2)
      |, model AS (SELECT slot,
      |    CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt,
      |    CAST(COUNT(*) AS BIGINT) AS r_cnt
      |  FROM sl GROUP BY slot)
      |, tot AS (SELECT CAST(SUM(t_cnt) AS BIGINT) AS t_tot,
      |    CAST(SUM(r_cnt) AS BIGINT) AS r_tot FROM model)
      |, sc AS (SELECT ds.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(cnt * (CAST(round(ln(t_cnt + 1) * 1e6) AS BIGINT)
      |        - CAST(round(ln(r_cnt + 1) * 1e6) AS BIGINT))) AS BIGINT)
      |      AS num_m
      |  FROM ds JOIN model USING (slot) GROUP BY ds.doc_id)
      |, wt AS (SELECT d2.doc_id,
      |    COALESCE(sc.n_bigrams, 0) AS n_bigrams,
      |    COALESCE(sc.num_m - sc.n_bigrams
      |        * (CAST(round(ln(tot.t_tot + 64) * 1e6) AS BIGINT)
      |         - CAST(round(ln(tot.r_tot + 64) * 1e6) AS BIGINT)), 0)
      |      AS weight_m
      |  FROM (SELECT doc_id FROM documents) d2
      |  LEFT JOIN sc ON sc.doc_id = d2.doc_id CROSS JOIN tot)
      |SELECT doc_id, n_bigrams, weight_m,
      |  (ROW_NUMBER() OVER (ORDER BY weight_m DESC, doc_id ASC)
      |     <= CEIL(COUNT(*) OVER () * 0.25)) AS selected
      |FROM wt ORDER BY doc_id""".stripMargin

  /** Reproducible per-epoch global shuffle — the training-loader contract
    * "every epoch is a different, deterministic permutation of the
    * corpus": position = global rank of md5(epoch ':' doc_id). ONE
    * GlobalIndex pass over the (epoch × corpus) explosion covers all
    * epochs — per-epoch position falls out as rank − epoch·N (every
    * epoch holds exactly N docs), so there is no per-epoch job, no
    * empty-partition window, and no rand() anywhere. */
  private def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    val epochs = 3
    val d = Sources.scatter(Sources.table(s, dir, "documents")
        .select(col("doc_id")))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("epoch", col("epoch").cast("long"))
      .withColumn("h", md5(concat(col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string"))))
    val n = d.filter(col("epoch") === 0).agg(count(lit(1)).as("n_docs"))
    graft.ops.GlobalIndex
      .withRowId(d, Seq(col("epoch").asc, col("h").asc), "gpos")
      .crossJoin(broadcast(n))
      .select(col("epoch"), col("doc_id"),
        (col("gpos") - col("epoch") * col("n_docs")).as("pos"))
      .orderBy("epoch", "pos")
  }

  private val epochShuffleOracle: String =
    """WITH e AS (SELECT doc_id, epoch
      |  FROM documents, (SELECT unnest([0, 1, 2]) AS epoch))
      |, h AS (SELECT epoch, doc_id,
      |    md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM e)
      |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY h ASC)
      |    AS BIGINT) AS pos
      |FROM h ORDER BY epoch, pos""".stripMargin

  /** Deterministic negative sampling for contrastive training: each
    * anchor's k negatives are its k successors on a HASH RING — docs
    * ordered by md5(seed:id), successor at distance 1..k, wrapping at
    * the end. Hash order is uncorrelated with any data attribute, so
    * ring successors are as-if-random negatives, yet fully reproducible
    * (resume-safe, engine-independent, no rand()). One GlobalIndex pass
    * builds the ring; pairing is ONE join keyed on ring rank — no
    * per-anchor sampling loop, no candidate broadcast, no self-pairs
    * (distance ≥ 1). */
  private def negativeSample(s: SparkSession, dir: String): DataFrame = {
    val k = 3
    val ranked = graft.ops.GlobalIndex.withRowId(
      Sources.scatter(Sources.table(s, dir, "documents")
          .select(col("doc_id")))
        .withColumn("h", md5(concat(lit("negs-v1:"),
          col("doc_id").cast("string")))),
      Seq(col("h").asc), "rn")
      .select(col("doc_id"), col("rn"))
    val n = ranked.agg(count(lit(1)).as("n_docs"))
    ranked.crossJoin(broadcast(n))
      .select(col("doc_id").as("anchor_id"), col("rn"), col("n_docs"))
      .withColumn("off", explode(sequence(lit(1), lit(k))))
      .withColumn("cand_rn",
        (col("rn") - 1 + col("off")) % col("n_docs") + 1)
      .join(ranked.select(col("doc_id").as("neg_id"),
        col("rn").as("cand_rn")), "cand_rn")
      .select(col("anchor_id"), col("off"), col("neg_id"))
      .orderBy("anchor_id", "off")
  }

  private val negativeSampleOracle: String =
    """WITH h AS (SELECT doc_id,
      |    md5('negs-v1:' || CAST(doc_id AS VARCHAR)) AS h FROM documents)
      |, r AS (SELECT doc_id,
      |    ROW_NUMBER() OVER (ORDER BY h ASC) AS rn FROM h)
      |, n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM r)
      |, o AS (SELECT unnest([1, 2, 3]) AS off)
      |SELECT a.doc_id AS anchor_id, o.off, c.doc_id AS neg_id
      |FROM r a CROSS JOIN o CROSS JOIN n
      |JOIN r c ON c.rn = (a.rn - 1 + o.off) % n.n_docs + 1
      |ORDER BY anchor_id, off""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("f_dsir_weights", dsirWeights, Some(dsirOracle)),
    QueryDef("f_epoch_shuffle", epochShuffle, Some(epochShuffleOracle)),
    QueryDef("f_negative_sample", negativeSample,
      Some(negativeSampleOracle)),
    QueryDef("f_token_budget_sample", tokenBudgetSample,
      Some(tokenBudgetOracle)),
    QueryDef("f_lang_temperature", langTemperature,
      Some(langTemperatureOracle)),
    QueryDef("pipeline_pretrain", pipelinePretrain,
      Some(pipelinePretrainOracle)),
    QueryDef("text_bpe_pairs", bpePairs, Some(bpePairsOracle)),
    QueryDef("sim_sparse_cosine", sparseCosine, Some(sparseCosineOracle)),
    QueryDef("text_bigram_surprisal", bigramSurprisal,
      Some(bigramSurprisalOracle)),
    QueryDef("text_surprisal_gate", surprisalGate,
      Some(surprisalGateOracle)),
    QueryDef("text_ccnet_buckets", ccnetBuckets, Some(ccnetBucketsOracle)),
    QueryDef("f_mix_weights", mixWeights, Some(mixWeightsOracle)),
    QueryDef("pack_sequences", packSequences, Some(packSequencesOracle)),
    QueryDef("f_stratified_sample", stratifiedSample,
      Some(stratifiedSampleOracle)),
    QueryDef("text_repetition", textRepetition, Some(textRepetitionOracle)),
    QueryDef("a_approx_percentile", approxPercentile,
      Some(approxPercentileOracle)),
  )
}
