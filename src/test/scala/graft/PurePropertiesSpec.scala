package graft

import graft.functions.KmvBuffer
import graft.streaming.StatefulUpsert
import graft.streaming.StatefulUpsert.{KeyedEvent, KeyState}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure (non-Spark) cores: the state fold
  * and the KMV sketch buffer. These run hundreds of generated cases where
  * the Spark suites run a handful of seeded ones.
  */
object PureProperties extends Properties("graft.pure") {

  private val genEvent: Gen[KeyedEvent] = for {
    ts  <- Gen.choose(0L, 50L)
    id  <- Gen.choose(0L, 1000000L)
    st  <- Gen.oneOf("a", "b", "c")
    amt <- Gen.option(Gen.choose(0, 99).map(_.toDouble))
  } yield KeyedEvent("k", ts, id, st, amt)

  private val genEvents: Gen[List[KeyedEvent]] =
    Gen.listOfN(30, genEvent).map(_.distinctBy(e => (e.ts, e.id)))

  /** Reference model: latest-wins dense, newest-non-null sparse. */
  private def model(ev: Seq[KeyedEvent]): (String, Option[Double]) = {
    val sorted = ev.sortBy(e => (e.ts, e.id))
    val status = sorted.lastOption.map(_.status).orNull
    val amount = sorted.reverse.collectFirst { case e if e.amount.isDefined => e.amount }.flatten
    (status, amount)
  }

  property("fold is order-insensitive and matches the latest-wins model") =
    Prop.forAll(genEvents, Gen.long) { (ev, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(ev)
      val s = StatefulUpsert.fold("k", None, shuffled.iterator)
      ev.isEmpty || ((s.status, s.amount) == model(ev))
    }

  private val genPrioItems: Gen[List[graft.streaming.StreamPipelines.PrioItem]] =
    Gen.listOfN(40, for {
      key <- Gen.choose(0L, 60L)
      w   <- Gen.choose(1L, 9L)
    } yield graft.streaming.StreamPipelines.PrioItem(w * 65536L / (key % 7L + 1L), key, w))
      .map(_.distinctBy(_.key))

  /** Reference model for the streaming priority-sample fold: top-k over
    * the union by (priority desc, key asc).
    */
  private def prioModel(items: Seq[graft.streaming.StreamPipelines.PrioItem], k: Int) =
    items.distinctBy(_.key).sortBy(i => (-i.priority, i.key)).take(k)

  property("prioFold is batching- and order-insensitive; duplicates collapse") =
    Prop.forAll(genPrioItems, Gen.choose(1, 6), Gen.choose(1, 5), Gen.long) {
      (items, k, nb, seed) =>
        val rnd = new scala.util.Random(seed)
        // shuffle, re-deliver a random prefix, then split into nb batches
        val redelivered = rnd.shuffle(items ++ items.take(rnd.nextInt(items.size + 1)))
        val batches = redelivered.grouped(math.max(1, redelivered.size / nb)).toList
        val folded = batches.foldLeft(List.empty[graft.streaming.StreamPipelines.PrioItem]) {
          (st, b) => graft.streaming.StreamPipelines.prioFold(st, b, k)
        }
        folded == prioModel(items, k)
    }

  property("prioFold under weight corrections retains the max-(priority, weight) occurrence") =
    Prop.forAll(genPrioItems, Gen.choose(1, 6), Gen.long) { (items, k, seed) =>
      val rnd = new scala.util.Random(seed)
      // a random subset re-arrives upgraded (an upstream weight correction)
      val corrected = items.collect {
        case i if rnd.nextBoolean() => i.copy(weight = i.weight + 3, priority = i.priority * 2)
      }
      val all = rnd.shuffle(items ++ corrected)
      val batches = all.grouped(math.max(1, all.size / 3)).toList
      val folded = batches.foldLeft(List.empty[graft.streaming.StreamPipelines.PrioItem]) {
        (st, b) => graft.streaming.StreamPipelines.prioFold(st, b, k)
      }
      val expect = all.groupBy(_.key).values
        .map(_.maxBy(i => (i.priority, i.weight))).toList
        .sortBy(i => (-i.priority, i.key)).take(k)
      folded == expect
    }

  property("fold is batching-insensitive") =
    Prop.forAll(genEvents, Gen.choose(1, 5)) { (ev, nb) =>
      val batches = ev.grouped(math.max(1, ev.size / nb)).toList
      val inc = batches.foldLeft(Option.empty[KeyState]) { (st, b) =>
        Some(StatefulUpsert.fold("k", st, b.iterator))
      }
      val all = StatefulUpsert.fold("k", None, ev.iterator)
      ev.isEmpty || inc.contains(all)
    }

  property("fold replay is idempotent") =
    Prop.forAll(genEvents) { ev =>
      val once  = StatefulUpsert.fold("k", None, ev.iterator)
      val twice = StatefulUpsert.fold("k", Some(once), ev.iterator)
      twice == once
    }

  property("KmvBuffer keeps the k unsigned-smallest distinct hashes") =
    Prop.forAll(Gen.listOf(Gen.long), Gen.choose(16, 64)) { (hs, k) =>
      val buf = new KmvBuffer(k)
      hs.foreach(buf.add)
      val expect = hs.distinct.sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0).take(k)
      buf.values.sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0).toSeq == expect
    }

  property("KmvBuffer merge == bulk add") =
    Prop.forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (h1, h2) =>
      val k = 32
      val merged = new KmvBuffer(k); val bulk = new KmvBuffer(k); val other = new KmvBuffer(k)
      h1.foreach(merged.add); h2.foreach(other.add); merged.mergeFrom(other)
      (h1 ++ h2).foreach(bulk.add)
      merged.values.sorted.toSeq == bulk.values.sorted.toSeq
    }

  private val genStream: Gen[List[String]] = Gen.listOf(Gen.frequency(
    5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
    4 -> Gen.choose(0, 500).map(i => s"t$i")))

  /** Misra-Gries invariant checker: every kept count undercounts its true
    * frequency by at most N/(m+1), and every item with true frequency
    * above N/(m+1) is kept.
    */
  private def mgInvariant(buf: graft.functions.MgBuffer, stream: Seq[String], m: Int): Boolean = {
    val n     = stream.size
    val bound = n / (m + 1)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val kept = buf.entries.toMap
    val countsOk = kept.forall { case (k, c) => c <= truth(k) && truth(k) - c <= bound }
    val keepsHot = truth.forall { case (k, c) => c <= bound || kept.contains(k) }
    countsOk && keepsHot && buf.size <= m
  }

  property("MgBuffer sequential stream satisfies the Misra-Gries guarantee") =
    Prop.forAll(genStream, Gen.choose(2, 12)) { (stream, m) =>
      val buf = new graft.functions.MgBuffer(m)
      stream.foreach(buf.add(_))
      mgInvariant(buf, stream, m)
    }

  property("MgBuffer merge of partitioned streams keeps the guarantee") =
    Prop.forAll(genStream, Gen.choose(2, 12), Gen.choose(1, 6)) { (stream, m, parts) =>
      val chunks = stream.grouped(math.max(1, stream.size / parts)).toList
      val bufs = chunks.map { c => val b = new graft.functions.MgBuffer(m); c.foreach(b.add(_)); b }
      val merged = bufs.headOption.getOrElse(new graft.functions.MgBuffer(m))
      bufs.drop(1).foreach(merged.mergeFrom)
      mgInvariant(merged, stream, m)
    }
}
