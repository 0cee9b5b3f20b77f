package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

import graft.operators.Hints

/** Pins the shared-leaf memo eviction contract (Hints.memoInsert /
  * memoPut / evictStale): everything after the LAST '@' is the fixture
  * fingerprint; eviction fires only for entries sharing the full
  * pre-'@' prefix (session + dir + variant tag) with a DIFFERENT
  * fingerprint. Regression test for the round-10 advice finding where
  * Dedup's two sweepSigMemo variants appended their tag AFTER the
  * fingerprint, so inserting one cross-evicted the other's
  * still-current leaf. */
class MemoEvictionSpec extends SparkSpec {

  private def df(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).toDF("v")
  }

  test("different variant tags under the same dir+fingerprint coexist") {
    val memo = new ConcurrentHashMap[String, DataFrame]()
    val a = df(1)
    val b = df(2)
    Hints.memoPut(memo, "sc1:/dir:incr-bkt@fpA", a)
    Hints.memoPut(memo, "sc1:/dir:sweep-sigs@fpA", b)
    assert(memo.containsKey("sc1:/dir:incr-bkt@fpA"),
      "sweep-sigs insert must not evict the incr-bkt leaf")
    assert(memo.containsKey("sc1:/dir:sweep-sigs@fpA"))
    assert(memo.size() === 2)
  }

  test("same variant with a changed fingerprint evicts the stale entry") {
    val memo = new ConcurrentHashMap[String, DataFrame]()
    val stale = df(1).persist()
    stale.count()
    Hints.memoPut(memo, "sc1:/dir:incr-bkt@fpOLD", stale)
    Hints.memoPut(memo, "sc1:/dir:incr-bkt@fpNEW", df(2))
    assert(!memo.containsKey("sc1:/dir:incr-bkt@fpOLD"),
      "regenerated fixture must displace the superseded leaf")
    assert(memo.containsKey("sc1:/dir:incr-bkt@fpNEW"))
    assert(memo.size() === 1)
  }

  test("memoInsert is idempotent for the same key and evicts stale twins") {
    val memo = new ConcurrentHashMap[String, DataFrame]()
    var builds = 0
    def build(): DataFrame = { builds += 1; df(3) }
    val first = Hints.memoInsert(memo, "sc1:/dir:tok#2@fpA", build())
    // Second insert with an eagerly-evaluated arg still counts a build
    // of the argument, so use the by-name path to check memo identity.
    val second = Hints.memoInsert(memo, "sc1:/dir:tok#2@fpA", build())
    assert(first eq second, "same key must return the cached leaf")
    Hints.memoInsert(memo, "sc1:/dir:tok#2@fpB", df(4))
    assert(!memo.containsKey("sc1:/dir:tok#2@fpA"))
    assert(memo.containsKey("sc1:/dir:tok#2@fpB"))
  }

  test("dedupIncr and dedupLshSweep leaves coexist in the live memo") {
    // End-to-end: construct both queries against the same fixture; the
    // round-10 bug made the second construction unpersist the first's
    // leaf. Both keys must survive with their variant tags intact.
    val d = sf0001
    graft.operators.Dedup.dedupIncr(spark, d)
    graft.operators.Dedup.dedupLshSweep(spark, d)
    val keys = {
      val f = graft.operators.Dedup.getClass.getDeclaredFields
        .find(_.getName.contains("sweepSigMemo")).get
      f.setAccessible(true)
      f.get(graft.operators.Dedup).asInstanceOf[ConcurrentHashMap[String, DataFrame]]
        .keySet().toArray.map(_.toString).toSeq
    }
    val mine = keys.filter(_.contains(":" + d + ":"))
    assert(mine.exists(k => k.contains(":incr-bkt@")),
      s"incr-bkt leaf missing from memo: $keys")
    assert(mine.exists(k => k.contains(":sweep-sigs@")),
      s"sweep-sigs leaf evicted by the later construction: $keys")
  }
}
