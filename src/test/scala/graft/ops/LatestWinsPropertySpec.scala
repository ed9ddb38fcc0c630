package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property tests (seeded-random, SURVEY.md §5): the upsert reduction must
  * converge regardless of how the event stream is batched or ordered —
  * the invariant that makes foreachBatch replay safe (reference
  * streaming_job.py:92-155 relies on exactly this).
  */
class LatestWinsPropertySpec extends SparkFunSuite {
  import spark.implicits._

  private def randomEvents(seed: Long, n: Int): Seq[(String, Long, Long, String, Option[Double])] = {
    val rnd = new Random(seed)
    (1 to n).map { i =>
      val key = s"k${rnd.nextInt(8)}"
      val ts  = rnd.nextInt(1000).toLong
      val st  = Seq("created", "paid", "shipped")(rnd.nextInt(3))
      val amt = if (rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None
      (key, ts, i.toLong, st, amt) // event_id i is the unique tiebreak
    }
  }

  private def state(df: DataFrame): Map[String, (String, Any, Any)] =
    LatestWins.latestState(df, Seq("k"), "ts", Seq("event_id"),
      denseCols = Seq("st"), sparseCols = Seq("amt"), maxOrderAlias = "last_seen")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.get(2), r.get(3))).toMap

  test("latestState is permutation-invariant") {
    for (seed <- 1L to 5L) {
      val ev = randomEvents(seed, 60)
      val shuffled = new Random(seed * 7).shuffle(ev)
      val a = state(ev.toDF("k", "ts", "event_id", "st", "amt"))
      val b = state(shuffled.toDF("k", "ts", "event_id", "st", "amt"))
      assert(a == b, s"seed=$seed")
    }
  }

  test("incremental merge of any batch split equals the all-at-once state") {
    for (seed <- 1L to 5L) {
      val ev  = randomEvents(seed, 80)
      val full = state(ev.toDF("k", "ts", "event_id", "st", "amt"))
      // merge is "source wins", so batches must respect event-time order
      // (exactly the foreachBatch contract: micro-batches arrive in stream
      // order); split the stream at global ts cuts
      val sorted  = ev.sortBy(_._2)
      val cut1    = sorted.size / 3
      val cut2    = 2 * sorted.size / 3
      val ordered = Seq(sorted.take(cut1), sorted.slice(cut1, cut2), sorted.drop(cut2))
      val merged2 = ordered.filter(_.nonEmpty).foldLeft(Option.empty[DataFrame]) { (accOpt, batch) =>
        val reduced = LatestWins.latestState(batch.toDF("k", "ts", "event_id", "st", "amt"),
          Seq("k"), "ts", Seq("event_id"), Seq("st"), Seq("amt"), "last_seen")
        Some(accOpt.fold(reduced)(acc => LatestWins.merge(acc, reduced, Seq("k"), Seq("amt"))))
      }.get
      val inc2 = merged2.collect().map(r => r.getString(0) -> (r.getString(1), r.get(2), r.get(3))).toMap
      assert(inc2 == full, s"seed=$seed (ordered batches)")
    }
  }

  test("replaying the last batch is idempotent") {
    for (seed <- 10L to 12L) {
      val ev = randomEvents(seed, 50)
      val sorted = ev.sortBy(_._2)
      val (b1, b2) = sorted.splitAt(sorted.size / 2)
      def reduce(b: Seq[(String, Long, Long, String, Option[Double])]) =
        LatestWins.latestState(b.toDF("k", "ts", "event_id", "st", "amt"),
          Seq("k"), "ts", Seq("event_id"), Seq("st"), Seq("amt"), "last_seen")
      val once  = LatestWins.merge(reduce(b1), reduce(b2), Seq("k"), Seq("amt"))
      val twice = LatestWins.merge(once, reduce(b2), Seq("k"), Seq("amt"))
      val a = once.collect().map(r => r.toSeq).toSet
      val b = twice.collect().map(r => r.toSeq).toSet
      assert(a == b, s"seed=$seed")
    }
  }
}
