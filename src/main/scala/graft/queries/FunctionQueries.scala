package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Scalar-function surface (SURVEY §2.8 widened): string, date, array
  * position, and map functions, plus deterministic group sampling and
  * corpus n-gram mining. All pure codegen'd built-ins — narrow map
  * stages that scale linearly with input splits; the only shuffles are
  * the final aggregations the query semantics require.
  */
object FunctionQueries extends QueryGroup {

  /** String-function sweep over documents: regex extraction/counting,
    * split/slice/join, case mapping, padding, search position,
    * character translation. Arrays leave the query as joined strings
    * (the repo-wide cross-engine array convention). */
  private def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "documents")
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '[a-z]+', 0)")).cast("long")
          .as("n_words_re"),
        regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
        array_join(slice(split(col("text"), " "), 1, 3), "|").as("head3"),
        upper(substring(col("text"), 1, 10)).as("head_upper"),
        reverse(substring(col("text"), 1, 10)).as("head_rev"),
        lpad(col("lang"), 5, "_").as("lang_pad"),
        instr(col("text"), "table").cast("long").as("pos_table"),
        translate(substring(col("text"), 1, 20), "aeiou", "AEIOU")
          .as("head_tr"))
      .orderBy("doc_id")

  private val stringFuncsOracle: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT)
      |    AS n_words_re,
      |  regexp_extract(text, '^([a-z]+)', 1) AS first_word,
      |  array_to_string(list_slice(string_split(text, ' '), 1, 3), '|')
      |    AS head3,
      |  upper(substring(text, 1, 10)) AS head_upper,
      |  reverse(substring(text, 1, 10)) AS head_rev,
      |  lpad(lang, 5, '_') AS lang_pad,
      |  CAST(strpos(text, 'table') AS BIGINT) AS pos_table,
      |  translate(substring(text, 1, 20), 'aeiou', 'AEIOU') AS head_tr
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Date/time-function sweep over orders: truncation, clamped month
    * arithmetic, month boundaries, ISO weekday, quarter, formatting.
    * Dates leave as VARCHAR (repo convention — pandas date vs timestamp
    * normalization differs otherwise). */
  private def dateFuncs(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
      .select(col("o_orderkey"),
        date_trunc("month", col("d")).cast("date").cast("string")
          .as("month_start"),
        add_months(col("d"), 3).cast("string").as("plus3m"),
        last_day(col("d")).cast("string").as("month_end"),
        (weekday(col("d")) + 1).cast("long").as("iso_dow"),
        quarter(col("d")).cast("long").as("qtr"),
        date_format(col("d"), "yyyy-MM").as("ym"),
        datediff(col("d"), lit("2020-01-01")).cast("long").as("d_since"))
      .orderBy("o_orderkey")

  private val dateFuncsOracle: String =
    """WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
      |           FROM orders)
      |SELECT o_orderkey,
      |  CAST(date_trunc('month', d) AS VARCHAR) AS month_start,
      |  CAST(CAST(d + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m,
      |  CAST(last_day(d) AS VARCHAR) AS month_end,
      |  CAST(isodow(d) AS BIGINT) AS iso_dow,
      |  CAST(quarter(d) AS BIGINT) AS qtr,
      |  strftime(d, '%Y-%m') AS ym,
      |  CAST(d - DATE '2020-01-01' AS BIGINT) AS d_since
      |FROM o ORDER BY o_orderkey""".stripMargin

  /** Positional explode: the first five tokens of each document with
    * their 0-based positions — the UNNEST WITH ORDINALITY shape (lateral
    * array-to-rows with position retained). Narrow: each row fans out to
    * ≤5 rows in place, no shuffle before the final order. */
  private def posExplode(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(slice(split(col("text"), " "), 1, 5))
          .as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
      .orderBy("doc_id", "pos")

  private val posExplodeOracle: String =
    """WITH t AS (SELECT doc_id,
      |    list_slice(string_split(text, ' '), 1, 5) AS l FROM documents)
      |SELECT doc_id,
      |  unnest(range(0, len(l))) AS pos,
      |  unnest(l) AS word
      |FROM t ORDER BY doc_id, pos""".stripMargin

  /** Map-typed column surface: per-user event-type counts built into a
    * MapType with map_from_entries, then read back via element_at /
    * map_keys. The oracle states the same result relationally
    * (filtered counts) — the map is the implementation under test. */
  private def mapOps(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt"))))
        .as("m"))
      .select(col("user_id"),
        coalesce(element_at(col("m"), "view"), lit(0L)).as("n_view"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
        size(col("m")).cast("long").as("n_types"),
        array_join(array_sort(map_keys(col("m"))), ",").as("types_s"))
      .orderBy("user_id")

  private val mapOpsOracle: String =
    """SELECT user_id,
      |  CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
      |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
      |    AS n_purchase,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
      |  array_to_string(list_sort(list(DISTINCT event_type)), ',')
      |    AS types_s
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Deterministic k-per-group sample: 3 documents per language, chosen
    * by md5-hash order of the key — reproducible across engines, runs,
    * and cluster sizes (no rand()), uniform-ish because md5 scrambles.
    * The window's group count is bounded by k via WindowGroupLimit, so
    * no full per-group sort materializes at scale. */
  private def groupSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")).asc)
    Sources.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .orderBy("lang", "rk")
  }

  private val groupSampleOracle: String =
    """WITH r AS (SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
      |  FROM documents)
      |SELECT doc_id, lang, rk FROM r WHERE rk <= 3
      |ORDER BY lang, rk""".stripMargin

  /** Corpus bigram mining: top-20 adjacent word pairs by frequency with
    * a lexical tie-break. The bigram generation is a higher-order
    * transform over the token array (no self-join on token position),
    * exploded once; the count is one hash aggregate. */
  private def topNgrams(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "documents")
      // zip_with over the two shifted slices: empty-safe for one-token
      // docs (sequence(1, size-1) would count DOWN for size = 1)
      .select(expr(
        """explode(zip_with(
          |  slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
          |  slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
          |  (a, b) -> concat(a, ' ', b)))""".stripMargin).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram").asc)
      .limit(20)

  private val topNgramsOracle: String =
    """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      |b AS (SELECT unnest(list_transform(range(1, len(toks)),
      |               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      |      FROM t)
      |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM b GROUP BY 1
      |ORDER BY cnt DESC, bigram ASC LIMIT 20""".stripMargin

  /** Schema-evolution union: a pre-migration extract (no props column)
    * unions with a post-migration one BY NAME with missing columns
    * null-filled — `unionByName(allowMissingColumns)`, the contract
    * that lets old and new batches flow through one pipeline. The
    * oracle states the row-level semantics directly. */
  private def unionEvolve(s: SparkSession, dir: String): DataFrame = {
    val e = Sources.table(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("props"))
    val v1 = e.filter(col("event_id") % 2 === 0).drop("props")
    val v2 = e.filter(col("event_id") % 2 =!= 0)
    v1.unionByName(v2, allowMissingColumns = true)
      .orderBy("event_id")
  }

  private val unionEvolveOracle: String =
    """SELECT event_id, event_type,
      |  CASE WHEN event_id % 2 = 0 THEN NULL ELSE props END AS props
      |FROM events ORDER BY event_id""".stripMargin

  /** Ordered string aggregation (LISTAGG / string_agg): the distinct
    * ship months per (returnflag, linestatus), high-quantity lines only,
    * concatenated in order — the report-formatting aggregate every SQL
    * dialect grew its own syntax for.
    *
    * Determinism is the whole trick: collect_set carries no order, so the
    * array is sorted BEFORE joining — the result is a pure function of
    * the set, not of partitioning. Scale: distinct-months-per-group is
    * bounded (≤ #months in the data), so the collected arrays stay tiny
    * even when the fact table does not; the distinct pre-aggregate is
    * map-side combinable. */
  private def listaggMonths(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "lineitem")
      .filter(col("l_quantity") >= 49)
      .select(col("l_returnflag"), col("l_linestatus"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ym"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sort_array(collect_set(col("ym"))).as("yms"))
      .select(col("l_returnflag"), col("l_linestatus"),
        array_join(col("yms"), ",").as("months"),
        size(col("yms")).cast("long").as("n_months"))
      .orderBy("l_returnflag", "l_linestatus")

  private val listaggMonthsOracle: String =
    """WITH d AS (SELECT DISTINCT l_returnflag, l_linestatus,
      |    strftime(l_shipdate, '%Y-%m') AS ym
      |  FROM lineitem WHERE l_quantity >= 49)
      |SELECT l_returnflag, l_linestatus,
      |  string_agg(ym, ',' ORDER BY ym) AS months,
      |  CAST(COUNT(*) AS BIGINT) AS n_months
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("o_listagg_months", listaggMonths, Some(listaggMonthsOracle)),
    QueryDef("o_union_evolve", unionEvolve, Some(unionEvolveOracle)),
    QueryDef("p_string_funcs", stringFuncs, Some(stringFuncsOracle)),
    QueryDef("p_date_funcs", dateFuncs, Some(dateFuncsOracle)),
    QueryDef("o_posexplode", posExplode, Some(posExplodeOracle)),
    QueryDef("o_map_ops", mapOps, Some(mapOpsOracle)),
    QueryDef("f_group_sample", groupSample, Some(groupSampleOracle)),
    QueryDef("text_top_ngrams", topNgrams, Some(topNgramsOracle)),
  )
}
