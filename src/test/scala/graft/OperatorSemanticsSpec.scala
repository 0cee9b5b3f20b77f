package graft

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edge-case semantics pinned per SURVEY.md §5.2.2 micro-fixtures. */
class OperatorSemanticsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("session boundary: gap of exactly 30min does NOT split (> semantics)") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(sec: Long) = new Timestamp(t0.getTime + sec * 1000)
    val df = Seq(
      (1L, t0), (2L, plus(1799)), (3L, plus(1799 + 1800)), (4L, plus(1799 + 1800 + 1801)))
      .toDF("event_id", "ts")
      .withColumn("user_id", lit(7L))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = df
      .withColumn("epoch_s", expr("unix_micros(ts) div 1000000"))
      .withColumn("gap_s", col("epoch_s") - lag(col("epoch_s"), 1).over(w))
      .withColumn("new_sess",
        when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      .withColumn("sess_seq", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val seqs = sess.orderBy("event_id").select("sess_seq").as[Long].collect()
    // gaps: -, 1799 (same), 1800 (same: > not >=), 1801 (split)
    assert(seqs.toSeq == Seq(1L, 1L, 1L, 2L))
  }

  test("rollup produces leaf + subtotal + grand-total rows") {
    import spark.implicits._
    val df = Seq(("A", "x", 1), ("A", "y", 2), ("B", "x", 3), ("B", "y", 4))
      .toDF("r", "n", "v")
    val out = df.rollup("r", "n").agg(sum("v")).collect()
    assert(out.length == 7) // 4 leaf + 2 subtotal + 1 grand total
  }

  test("pivot with explicit values emits null for missing cells") {
    import spark.implicits._
    val df = Seq(("d1", "click", 1.0), ("d1", "view", 2.0), ("d2", "view", 3.0))
      .toDF("day", "et", "v")
    val out = df.groupBy("day").pivot("et", Seq("click", "view", "error"))
      .agg(sum("v")).orderBy("day").collect()
    assert(out(1).isNullAt(1) && out(0).isNullAt(3) == false || out(0).schema.size == 4)
    assert(out(1).getAs[Any]("error") == null && out(1).getAs[Double]("view") == 3.0)
  }

  test("element_at is 1-based") {
    import spark.implicits._
    val first = Seq(Seq(10, 20, 30)).toDF("a")
      .select(element_at(col("a"), 1)).head().getInt(0)
    assert(first == 10)
  }

  test("get_json_object yields null on malformed/missing keys") {
    import spark.implicits._
    val df = Seq("""{"k": 87}""", "null", "{}", """{"k":"x"}""", "not json")
      .toDF("props")
      .select(expr("try_cast(get_json_object(props, '$.k') AS bigint)").as("k"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got(0).contains(87L) && got(1).isEmpty && got(2).isEmpty && got(4).isEmpty)
  }

  test("haversine UDF agrees with the pure-column mirror expression") {
    import spark.implicits._
    val df = Seq((43.0, -79.0), (-10.5, 100.5), (0.0, 0.0)).toDF("lat", "lon")
    val hav = udf(operators.Geo.haversineKm)
    val udfKm = df.select(hav(col("lat"), col("lon"), lit(43.6532), lit(-79.3832)))
      .as[Double].collect()
    val colKm = df.select(
      lit(2 * 6371.0088) * asin(sqrt(
        pow(sin(radians(lit(43.6532) - col("lat")) / 2), 2) +
          cos(radians(col("lat"))) * cos(radians(lit(43.6532))) *
          pow(sin(radians(lit(-79.3832) - col("lon")) / 2), 2))))
      .as[Double].collect()
    udfKm.zip(colKm).foreach { case (u, c) => assert(math.abs(u - c) < 1e-9) }
  }

  test("as-of lag join yields null prev for each user's first event") {
    val out = operators.Joins.joinAsof(spark, sf0001)
    assert(out.filter(col("prev_event_id").isNull).count() > 0)
    assert(out.filter(col("gap_us") < 0).count() == 0)
  }

  test("weighted-avg Aggregator matches algebraic identity") {
    import spark.implicits._
    val df = Seq((10.0, 2.0), (20.0, 1.0), (30.0, 3.0)).toDF("price", "qty")
    val wavg = udaf(functions.WeightedAvg)
    val got = df.agg(wavg(col("price"), col("qty"))).as[Double].head()
    assert(math.abs(got - (10 * 2 + 20 * 1 + 30 * 3) / 6.0) < 1e-12)
  }
}
