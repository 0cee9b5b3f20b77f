package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinApi

/** The native as-of operator vs the compositional window formulation,
  * plus the edge semantics the sf oracle can't isolate: no-match nulls,
  * exact-tie inclusiveness, latest-of-several selection, and key
  * boundaries between adjacent users in one sorted partition. */
class AsOfJoinSpec extends SparkSpec {

  test("native exec matches the union+window asof row for row") {
    val native = operators.Joins.joinAsofNative(spark, sf0001).collect()
    val window = operators.Joins.queries("q_join_asof2")(spark, sf0001).collect()
    assert(native.length == window.length)
    for ((n, w) <- native.zip(window))
      assert(n == w, s"native $n != window $w")
  }

  test("plan runs AsOfJoinExec with one exchange per side and no window") {
    val df = operators.Joins.joinAsofNative(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the node prints "AsOfJoin"
    assert(p.contains("AsOfJoin"), s"custom exec not planned:\n$p")
    assert(!p.contains("Window"), s"window crept into the native path:\n$p")
    // AQE prints Final AND Initial plan sections — count only the final
    val finalSection = p.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalSection).length
    assert(exchanges == 2, s"expected 2 key shuffles, saw $exchanges:\n$p")
  }

  test("edge semantics: no-match nulls, tie inclusive, latest wins, key fences") {
    import spark.implicits._
    // left: (id, key, t)    right: (rid, key, t)
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 50L),
      (4L, 20L, 100L), (5L, 30L, 100L))
      .toDF("id", "k", "t")
    val r = Seq((101L, 10L, 100L), (102L, 10L, 150L), (103L, 20L, 101L),
      (104L, 40L, 1L))
      .toDF("rid", "rk", "rt")
    val got = AsOfJoinApi.join(l, r, "k", "rk", "t", "rt")
      .select(col("id"), col("rid"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(got == Map(
      1L -> 101L, // exact tie t=100/rt=100 matches (ASOF >= semantics)
      2L -> 102L, // latest of the two eligible signups wins
      3L -> -1L,  // right rows exist for the key but all LATER -> null
      4L -> -1L,  // right t=101 is after left t=100 -> null
      5L -> -1L   // key 30 has no right rows; key 40's row must not leak
    ), s"asof edge semantics wrong: $got")
  }

  test("api: a missing column fails with the column list, not a blind get") {
    import spark.implicits._
    val l = Seq((1L, 2L)).toDF("k", "t")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinApi.join(l, l, "k", "nope", "t", "t")
    }
    assert(e.getMessage.contains("nope") && e.getMessage.contains("k, t"))
  }

  test("merge state resets across key boundaries within one partition") {
    import spark.implicits._
    // force everything into one partition: adjacent keys share a task,
    // so a stale held row from key A must never serve key B.
    val l = (1L to 6L).map(k => (k, k, 1000L)).toDF("id", "k", "t")
      .repartition(1)
    val r = Seq((900L, 2L, 10L), (901L, 4L, 10L)).toDF("rid", "rk", "rt")
      .repartition(1)
    val got = AsOfJoinApi.join(l, r, "k", "rk", "t", "rt")
      .select(col("k"), col("rid"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(got == Map(1L -> -1L, 2L -> 900L, 3L -> -1L, 4L -> 901L,
      5L -> -1L, 6L -> -1L), s"held state leaked across keys: $got")
  }
}
