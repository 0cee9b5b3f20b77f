package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function surface (SURVEY.md §2.8): string/date/math/array/map/
  * JSON/higher-order — plus the reference's signature wrangling trio
  * (name normalization, tag classification, postcode cleaning).
  *
  * Everything here is a narrow (no-shuffle) transformation until the final
  * aggregate/sort, and all of it stays inside whole-stage codegen (built-in
  * functions only, no UDFs). Determinism notes: derived doubles are either
  * produced by dividing identical integers (bit-exact across engines) or
  * rounded at a scale the data is not quantized at (§7.4).
  */
object Scalars {

  /** upper/lower/trim/substring/concat/length/replace/regexp_extract. */
  def strFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        length(col("c_name")).cast("long").as("name_len"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        regexp_extract(col("c_name"), "(\\d+)", 1).cast("long").as("cid"),
        expr("replace(c_name, 'Customer#', 'C-')").as("replaced"),
        concat(col("c_mktsegment"), lit("-"), col("c_name")).as("seg_name"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"))
      .orderBy(col("c_custkey").asc)
      .limit(200)

  /** Reference `update_name(name, mapping)` analog: the trailing token of
    * p_name mapped through a correction dictionary (St→Street style);
    * unmapped tokens pass through. Lookup is a literal map + element_at —
    * constant-folded, no join. */
  def strNormalize(s: SparkSession, d: String): DataFrame = {
    val mapping = map(
      lit("widget"), lit("Widget"), lit("bolt"), lit("Bolt"),
      lit("gear"), lit("Gear"), lit("anvil"), lit("Anvil"))
    Tables.part(s, d)
      .withColumn("noun", regexp_extract(col("p_name"), "(\\w+)$", 1))
      .withColumn("normalized", coalesce(element_at(mapping, col("noun")), col("noun")))
      .groupBy(col("normalized"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("normalized").asc)
  }

  /** Reference tags.py `key_type()` analog: classify synthesized keys into
    * lower / lower_colon / problemchars / other with the template's exact
    * regexes, count per class. */
  def tagClassify(s: SparkSession, d: String): DataFrame = {
    val problem = "[=+/&<>;'\"?%#$@,. \t\r\n]"
    Tables.part(s, d)
      .withColumn("key",
        when(col("p_partkey") % 4 === 0, lower(col("p_type")))
          .when(col("p_partkey") % 4 === 1,
            concat(lower(col("p_type")), lit(":"),
              regexp_extract(col("p_name"), "(\\w+)$", 1)))
          .when(col("p_partkey") % 4 === 2, col("p_brand"))
          .otherwise(col("p_type")))
      .withColumn("key_class",
        when(col("key").rlike("^([a-z]|_)*$"), "lower")
          .when(col("key").rlike("^([a-z]|_)*:([a-z]|_)*$"), "lower_colon")
          .when(col("key").rlike(problem), "problemchars")
          .otherwise("other"))
      .groupBy(col("key_class"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("key_class").asc)
  }

  /** Postcode audit/clean analog: derive a pseudo-postcode, validate its
    * shape, normalize (upper-case), count per normalized form. */
  def postcodeClean(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("raw_pc",
        when(col("c_custkey") % 3 === 0,
          concat(lit("m"), (col("c_custkey") % 10).cast("string"), lit("v")))
        .when(col("c_custkey") % 3 === 1,
          concat(lit("M"), ((col("c_custkey") + 3) % 10).cast("string"), lit("V")))
        .otherwise(concat(lit("#"), (col("c_custkey") % 10).cast("string"))))
      .withColumn("norm_pc", upper(col("raw_pc")))
      .withColumn("valid", col("norm_pc").rlike("^[A-Z][0-9][A-Z]$"))
      .groupBy(col("norm_pc"), col("valid"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("norm_pc").asc, col("valid").asc)

  /** year/month/date_trunc/datediff/last_day over order dates. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("y", year(col("o_orderdate")).cast("long"))
      .withColumn("m", month(col("o_orderdate")).cast("long"))
      .withColumn("month_start",
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd"))
      .withColumn("month_end",
        date_format(last_day(to_date(col("o_orderdate"))), "yyyy-MM-dd"))
      .withColumn("days_since",
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).cast("long"))
      .groupBy(col("y"), col("m"), col("month_start"), col("month_end"))
      .agg(count(lit(1)).as("cnt"), max(col("days_since")).as("max_days"))
      .orderBy(col("y").asc, col("m").asc)

  /** abs/floor/ceil/power/sqrt/ln/mod. Irrational outputs rounded at 4
    * (inputs aren't 4-decimal quantized, so no tie risk). */
  def mathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("abs_bal"),
        floor(col("c_acctbal")).cast("long").as("flr"),
        ceil(col("c_acctbal")).cast("long").as("cl"),
        pow(col("c_custkey") % 10, 2).as("pw"),
        round(sqrt(abs(col("c_acctbal"))), 4).as("sq"),
        round(log(abs(col("c_acctbal")) + 1), 4).as("lg"),
        (col("c_custkey") % 7).as("md"))
      .orderBy(col("c_custkey").asc)
      .limit(300)

  /** JSON extraction from the events.props tag map (OSM tag analog).
    * try_cast → null-on-malformed instead of an ANSI runtime error. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS bigint)"))
      .withColumn("k_bucket", expr("k div 10"))
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value")), 2).as("sum_val"))
      .orderBy(col("k_bucket").asc)

  /** Array ops over embeddings: size / element_at (1-based both engines) /
    * slice / array_sort. Elements pass through cast-to-double only — no
    * arithmetic, so values are bit-exact. */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("e_first"),
        element_at(col("embedding"), 64).cast("double").as("e_last"),
        element_at(array_sort(slice(col("embedding"), 1, 8)), 1)
          .cast("double").as("min_first8"))
      .orderBy(col("vec_id").asc)

  /** Map ops: colon-split key into a type/key map (shape_element analog),
    * read back with element_at. Oracle compares the extracted columns. */
  def mapFuncs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("ck", concat(col("lang"), lit(":"), col("source")))
      .withColumn("parts", split(col("ck"), ":"))
      .withColumn("m", map(
        lit("type"), element_at(col("parts"), 1),
        lit("key"), element_at(col("parts"), 2)))
      .select(
        col("doc_id"),
        element_at(col("m"), "type").as("tag_type"),
        element_at(col("m"), "key").as("tag_key"))
      .orderBy(col("doc_id").asc)
      .limit(300)

  /** Higher-order functions: transform + aggregate lambdas. Both engines
    * fold sequentially over the same element order (DuckDB side is forced
    * through list_reduce), so the doubles are bit-identical pre-round. */
  def higherOrder(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        expr("round(aggregate(transform(embedding, x -> cast(x AS double) * 2)," +
          " cast(0 AS double), (a, x) -> a + x), 4)").as("sum2x"),
        expr("round(aggregate(transform(embedding, x -> cast(x AS double) * cast(x AS double))," +
          " cast(0 AS double), (a, x) -> a + x), 4)").as("sumsq"))
      .orderBy(col("vec_id").asc)

  /** VARIANT semi-structured path (Spark 4): parse_json once into a
    * binary VARIANT value, then typed variant_get extraction — the
    * open-schema column pattern that replaces string re-parsing per
    * field. Unlike get_json_object (string in, string out, re-parse per
    * call), the parse cost is paid once per row and every extraction is
    * a typed pointer walk. Output counts per extracted key parity +
    * the min/max key observed, all exact integers. */
  def jsonVariant(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", expr("parse_json(props)"))
      .withColumn("k", expr("variant_get(v, '$.k', 'bigint')"))
      .groupBy((col("k") % 2).as("k_parity"))
      .agg(count(lit(1)).as("cnt"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("k_parity").asc)

  /** Canonical lexicon entries for the fuzzy-reconciliation query —
    * deliberately including misspelled forms so distances are nonzero.
    * ONE constant renders both the Spark literal array and the oracle's
    * VALUES list. */
  private val fuzzyLex = Seq("widgit", "bolt", "gear", "washor", "valv", "sproket")

  /** Fuzzy lexicon reconciliation (the data-cleaning join): map each
    * distinct product noun to its nearest lexicon entry by levenshtein
    * distance, tie-broken (dist, word). The SCALE DISCIPLINE is the
    * pre-aggregation: dedupe to distinct keys FIRST, then fuzzy-compare
    * |distinct| × |lexicon| — never fact-row × lexicon. The lexicon
    * broadcast keeps the bounded nested-loop map-side; a real catalog
    * reconciliation swaps the 6 literals for a dimension table and
    * nothing else changes. */
  def strFuzzy(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nouns = Tables.part(s, d)
      .withColumn("noun", element_at(split(col("p_name"), " "), -1))
      .groupBy(col("noun")).agg(count(lit(1)).as("n_parts"))
    val lex = s.createDataFrame(fuzzyLex.map(Tuple1(_)))
      .toDF("w")
    val byDist = Window.partitionBy(col("noun"))
      .orderBy(col("dist").asc, col("w").asc)
    nouns.crossJoin(broadcast(lex))
      .withColumn("dist", levenshtein(col("noun"), col("w")).cast("long"))
      .withColumn("rn", row_number().over(byDist))
      .filter(col("rn") === 1)
      .select(col("noun"), col("w").as("best_match"), col("dist"),
        col("n_parts"))
      .orderBy(col("noun").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_fuzzy"      -> strFuzzy,
    "q_json_variant"   -> jsonVariant,
    "q_str_funcs"      -> strFuncs,
    "q_str_normalize"  -> strNormalize,
    "q_tag_classify"   -> tagClassify,
    "q_postcode_clean" -> postcodeClean,
    "q_date_funcs"     -> dateFuncs,
    "q_math_funcs"     -> mathFuncs,
    "q_json_extract"   -> jsonExtract,
    "q_array_funcs"    -> arrayFuncs,
    "q_map_funcs"      -> mapFuncs,
    "q_higher_order"   -> higherOrder
  )

  val oracle: Map[String, String] = Map(
    "q_str_fuzzy" ->
      s"""WITH nouns AS (
        |  SELECT string_split(p_name, ' ')[-1] AS noun, count(*) AS n_parts
        |  FROM part GROUP BY noun),
        |lex(w) AS (VALUES ${fuzzyLex.map(w => s"('$w')").mkString(", ")}),
        |cand AS (
        |  SELECT noun, w, CAST(levenshtein(noun, w) AS BIGINT) AS dist,
        |         n_parts,
        |         row_number() OVER (PARTITION BY noun
        |                            ORDER BY levenshtein(noun, w) ASC, w ASC) AS rn
        |  FROM nouns CROSS JOIN lex)
        |SELECT noun, w AS best_match, dist, n_parts
        |FROM cand WHERE rn = 1
        |ORDER BY noun ASC""".stripMargin,
    "q_json_variant" ->
      """SELECT k % 2 AS k_parity, count(*) AS cnt,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY k_parity
        |ORDER BY k_parity ASC""".stripMargin,
    "q_str_funcs" ->
      """SELECT c_custkey,
        |       upper(c_name) AS uname,
        |       lower(c_mktsegment) AS lseg,
        |       length(c_name) AS name_len,
        |       substring(c_name, 1, 8) AS name_prefix,
        |       CAST(regexp_extract(c_name, '(\d+)', 1) AS BIGINT) AS cid,
        |       replace(c_name, 'Customer#', 'C-') AS replaced,
        |       c_mktsegment || '-' || c_name AS seg_name,
        |       trim('  ' || c_name || '  ') AS trimmed
        |FROM customer
        |ORDER BY c_custkey ASC
        |LIMIT 200""".stripMargin,
    "q_str_normalize" ->
      """SELECT CASE regexp_extract(p_name, '(\w+)$', 1)
        |         WHEN 'widget' THEN 'Widget'
        |         WHEN 'bolt'   THEN 'Bolt'
        |         WHEN 'gear'   THEN 'Gear'
        |         WHEN 'anvil'  THEN 'Anvil'
        |         ELSE regexp_extract(p_name, '(\w+)$', 1)
        |       END AS normalized,
        |       count(*) AS cnt
        |FROM part
        |GROUP BY normalized
        |ORDER BY normalized ASC""".stripMargin,
    "q_tag_classify" ->
      ("""SELECT CASE
        |         WHEN regexp_full_match(key, '^([a-z]|_)*$') THEN 'lower'
        |         WHEN regexp_full_match(key, '^([a-z]|_)*:([a-z]|_)*$') THEN 'lower_colon'
        |         WHEN regexp_matches(key, '[=+/&<>;''"?%#$@,. """ + "\t\r\n" + """]') THEN 'problemchars'
        |         ELSE 'other'
        |       END AS key_class,
        |       count(*) AS cnt
        |FROM (
        |  SELECT CASE
        |           WHEN p_partkey % 4 = 0 THEN lower(p_type)
        |           WHEN p_partkey % 4 = 1 THEN lower(p_type) || ':' || regexp_extract(p_name, '(\w+)$', 1)
        |           WHEN p_partkey % 4 = 2 THEN p_brand
        |           ELSE p_type
        |         END AS key
        |  FROM part)
        |GROUP BY key_class
        |ORDER BY key_class ASC""").stripMargin,
    "q_postcode_clean" ->
      """SELECT upper(raw_pc) AS norm_pc,
        |       regexp_full_match(upper(raw_pc), '^[A-Z][0-9][A-Z]$') AS valid,
        |       count(*) AS cnt
        |FROM (
        |  SELECT CASE
        |           WHEN c_custkey % 3 = 0 THEN 'm' || CAST(c_custkey % 10 AS VARCHAR) || 'v'
        |           WHEN c_custkey % 3 = 1 THEN 'M' || CAST((c_custkey + 3) % 10 AS VARCHAR) || 'V'
        |           ELSE '#' || CAST(c_custkey % 10 AS VARCHAR)
        |         END AS raw_pc
        |  FROM customer)
        |GROUP BY norm_pc, valid
        |ORDER BY norm_pc ASC, valid ASC""".stripMargin,
    "q_date_funcs" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |       count(*) AS cnt,
        |       max(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS max_days
        |FROM orders
        |GROUP BY y, m, month_start, month_end
        |ORDER BY y ASC, m ASC""".stripMargin,
    "q_math_funcs" ->
      """SELECT c_custkey,
        |       abs(c_acctbal) AS abs_bal,
        |       CAST(floor(c_acctbal) AS BIGINT) AS flr,
        |       CAST(ceil(c_acctbal) AS BIGINT) AS cl,
        |       pow(c_custkey % 10, 2) AS pw,
        |       round(sqrt(abs(c_acctbal)), 4) AS sq,
        |       round(ln(abs(c_acctbal) + 1), 4) AS lg,
        |       c_custkey % 7 AS md
        |FROM customer
        |ORDER BY c_custkey ASC
        |LIMIT 300""".stripMargin,
    "q_json_extract" ->
      """SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
        |       count(*) AS cnt,
        |       round(sum(value), 2) AS sum_val
        |FROM events
        |GROUP BY k_bucket
        |ORDER BY k_bucket ASC""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |       len(embedding) AS dim,
        |       CAST(embedding[1] AS DOUBLE) AS e_first,
        |       CAST(embedding[64] AS DOUBLE) AS e_last,
        |       CAST(list_sort(embedding[1:8])[1] AS DOUBLE) AS min_first8
        |FROM embeddings
        |ORDER BY vec_id ASC""".stripMargin,
    "q_map_funcs" ->
      """SELECT doc_id, lang AS tag_type, source AS tag_key
        |FROM documents
        |ORDER BY doc_id ASC
        |LIMIT 300""".stripMargin,
    "q_higher_order" ->
      """SELECT vec_id,
        |       round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)),
        |         (a, x) -> a + x), 4) AS sum2x,
        |       round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |         (a, x) -> a + x), 4) AS sumsq
        |FROM embeddings
        |ORDER BY vec_id ASC""".stripMargin
  )
}
