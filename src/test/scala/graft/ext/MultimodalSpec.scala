package graft.ext

import graft.SparkFunSuite
// (videoShotBoundaries cases below build controlled frame windows by hand)
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "hello world".getBytes("UTF-8")),
    (2L, Array[Byte](10, 20, 30)),
    (3L, Array.empty[Byte])
  ).toDF("id", "payload")

  test("meta computes size/digest/head without decoding") {
    val m = Multimodal.meta(media, "id", "payload")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(m(1L)._1 == 11L)
    assert(m(1L)._2 == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(m(3L)._1 == 0L)
  }

  test("frameFingerprintNearDups votes on ALIGNED frames only") {
    // n=2 windows of 2 bytes over 6-byte payloads: starts 1 and 4
    val ps = Seq(
      (1L, "abcdef"), // frames "ab", "de"
      (2L, "abzdez"), // same sampled windows, different elsewhere → 2 votes
      (3L, "xbcdef"), // frame 0 edited → only the idx-1 vote survives
      (4L, "deabzz")  // id 1's idx-1 frame bytes, but at idx 0 → no vote
    ).map { case (i, t) => (i, t.getBytes("UTF-8")) }.toDF("id", "payload")

    def pairs(minShared: Int) =
      Multimodal.frameFingerprintNearDups(ps, "id", "payload",
          n = 2, frameBytes = 2, minShared = minShared)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getBoolean(3)))).toMap

    // strict voting: only the all-frames match survives
    assert(pairs(2) == Map((1L, 2L) -> ((2L, true))))
    // one shared aligned frame: (1,3) and (2,3) join via idx-1 "de";
    // id 4 never pairs — its "de" sits at the wrong frame index
    assert(pairs(1) == Map(
      (1L, 2L) -> ((2L, true)),
      (1L, 3L) -> ((1L, false)),
      (2L, 3L) -> ((1L, false))))
  }

  test("frameFingerprintNearDups: the hot-block cap drops boilerplate frames") {
    // 8-byte payloads, n=2 windows of 4 bytes at offsets 1 and 5; all five
    // share the "AAAA" header frame (a template header), ids 1/2 also share
    // the tail frame
    val ps = Seq(
      (1L, "AAAAtttt"), (2L, "AAAAtttt"), (3L, "AAAAxxxx"),
      (4L, "AAAAyyyy"), (5L, "AAAAzzzz")
    ).map { case (i, t) => (i, t.getBytes("UTF-8")) }.toDF("id", "payload")

    def pairs(cap: Int) =
      Multimodal.frameFingerprintNearDups(ps, "id", "payload",
          n = 2, frameBytes = 4, minShared = 1, maxBlockSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // uncapped: the hot header block pairs everyone (C(5,2) = 10 pairs)
    assert(pairs(Int.MaxValue).size == 10)
    assert(pairs(Int.MaxValue)((1L, 2L)) == 2L)
    // cap 3: the size-5 header block is dropped; only the tail-frame pair
    // survives, with the header's vote gone
    assert(pairs(3) == Map((1L, 2L) -> 1L))
  }

  test("decodeStats agrees with decodeFeatures in exact integer form") {
    val stats = Multimodal.decodeStats(media, "id", "payload")
      .collect().map(s => s.id -> s).toMap
    val feats = Multimodal.decodeFeatures(media, "id", "payload")
      .collect().map(f => f.id -> f).toMap
    assert(stats.keySet == feats.keySet)
    stats.foreach { case (id, st) =>
      assert(st.width == feats(id).width.toLong && st.height == feats(id).height.toLong)
      val expected = if (st.bright_den == 0) 0.0 else st.bright_num.toDouble / st.bright_den
      assert(math.abs(expected - feats(id).brightness) < 1e-12)
    }
    // empty payload: zero fraction, zero denominator
    assert(stats(3L).bright_num == 0L && stats(3L).bright_den == 0L)
  }

  test("decodeFeatures runs the batched stub decoder per partition") {
    val feats = Multimodal.decodeFeatures(media.repartition(2), "id", "payload")
      .collect().map(f => f.id -> f).toMap
    assert(feats.size == 3)
    assert(feats(2L).width == 11 && feats(2L).height == 21) // 1 + (byte & 0x7f)
    assert(feats(3L).width == 0 && feats(3L).brightness == 0.0)
    // deterministic: same input → same output
    val again = Multimodal.decodeFeatures(media, "id", "payload").collect().map(f => f.id -> f).toMap
    assert(again == feats)
  }

  test("vadStats: energy gate, partial tail window, trim bounds, silent payload") {
    import spark.implicits._
    // bytes: 'a' (97) → (97−128)² = 961 per sample; ' ' (32) → 9216
    // window 4: "aaaa" = 3844 (quiet), "a  a" = 20354 (voiced)
    val rows = Seq(
      (1L, "aaaa" + "a  a" + "aaaa" + "a  a" + "aa"), // windows: q,V,q,V,q(tail)
      (2L, "aaaaaaaa"),                               // fully silent
      (3L, "  ")                                      // one partial voiced window
    ).toDF("doc_id", "t").select(col("doc_id"), col("t").cast("binary").as("payload"))
    val got = Multimodal.vadStats(rows, "doc_id", "payload",
        windowBytes = 4, threshold = 10000L)
      .collect().map(v => v.id -> v).toMap
    assert(got(1L) == Multimodal.VadStats(1L, 5L, 2L, 4000L, 1L, 3L))
    assert(got(2L) == Multimodal.VadStats(2L, 2L, 0L, 0L, -1L, -1L))
    assert(got(3L) == Multimodal.VadStats(3L, 1L, 1L, 10000L, 0L, 0L))
  }
  test("dhash: brightness shift (every char code +1) leaves the fingerprint unchanged") {
    import org.apache.spark.sql.functions._
    val base = "The quick brown fox jumps over the lazy dog. " * 8
    val shifted = base.map(c => (c + 1).toChar)
    val df = Seq((1L, base), (2L, shifted)).toDF("id", "payload")
    val fps = Multimodal.dhashFingerprints(df, "id", "payload").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fps(1L) == fps(2L))
  }

  test("dhash: a small local edit flips few bits; an unrelated payload flips many") {
    import org.apache.spark.sql.functions._
    val base = (1 to 400).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val edited = base.substring(0, 200) + "QQQQ" + base.substring(204)
    val other = (1 to 400).map(i => ('a' + (i * 11 % 26)).toChar).mkString
    val df = Seq((1L, base), (2L, edited), (3L, other)).toDF("id", "payload")
    val fps = Multimodal.dhashFingerprints(df, "id", "payload").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def ham(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(ham(fps(1L), fps(2L)) <= 4, s"local edit: ${ham(fps(1L), fps(2L))}")
    assert(ham(fps(1L), fps(3L)) > 10, s"unrelated: ${ham(fps(1L), fps(3L))}")
  }

  test("dhashNearDups finds the planted twin and the hot-band cap drops boilerplate blocks") {
    import org.apache.spark.sql.functions._
    val base = (1 to 400).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val twin = base.substring(0, 200) + "QQQQ" + base.substring(204)
    val fillers = (10L to 99L).map(i => (i, "x" * 50))   // 90 identical payloads
    val df = ((1L, base) +: (2L, twin) +: fillers).toDF("id", "payload")
    val pairs = Multimodal.dhashNearDups(df, "id", "payload",
        maxHamming = 3, maxBlockSize = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the twin pair survives; the 90-strong identical block is capped out
    assert(pairs == Set((1L, 2L)), s"pairs=$pairs")
    // with a loose cap the boilerplate block floods back in
    val flood = Multimodal.dhashNearDups(df, "id", "payload",
      maxHamming = 0, maxBlockSize = 1000).count()
    assert(flood >= 90L * 89L / 2)
  }

  test("dhashNearDups rejects maxHamming beyond the 4-band pigeonhole guarantee") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "abc")).toDF("id", "payload")
    intercept[IllegalArgumentException] {
      Multimodal.dhashNearDups(df, "id", "payload", maxHamming = 4)
    }
  }

  test("dhashNearDupsFromFresh: fresh probes index ∪ batch, directional output") {
    import org.apache.spark.sql.functions._
    val base  = (1 to 400).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val twin  = base.substring(0, 200) + "QQQQ" + base.substring(204)
    val other = (1 to 400).map(i => ('a' + (i * 11 % 26)).toChar).mkString
    val index = Multimodal.dhashFingerprints(
      Seq((1L, base), (3L, other)).toDF("id", "payload"), "id", "payload")
    // fresh batch: 2 twins indexed 1; 4 and 5 are within-batch twins
    val fresh = Multimodal.dhashFingerprints(
      Seq((2L, twin), (4L, other + "zz"), (5L, other + "zz"))
        .toDF("id", "payload"), "id", "payload")
    val got = Multimodal.dhashNearDupsFromFresh(index = index, fresh = fresh,
        maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // id is always the fresh side; indexed partners and batch partners
    // both surface (4↔5 appear in both directions — fresh × candidates)
    assert(got == Set((2L, 1L), (4L, 5L), (5L, 4L)), s"got=$got")
  }

  test("videoDhashNearDupsFromFresh: fresh-side votes agree with the batch operator") {
    import org.apache.spark.sql.functions._
    val base  = (1 to 800).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val twin  = base.map(c => (c + 1).toChar)          // hamming 0 per frame
    val other = (1 to 800).map(i => ('a' + (i * 11 % 26)).toChar).mkString
    // byte 150 is sampled by NO frame (frames at 0/200/400/600, 96 wide)
    val otherEd = other.substring(0, 150) + "QQ" + other.substring(152)
    // index: 1 and 3; fresh: 4 (twin of 1) and 6 (out-of-window edit of 3)
    val all = Seq((1L, base), (3L, other), (4L, twin), (6L, otherEd))
      .toDF("id", "payload")
    val index = Multimodal.videoFrameFingerprints(
      all.filter($"id" <= 3), "id", "payload", n = 4, frameBytes = 96)
    val fresh = Multimodal.videoFrameFingerprints(
      all.filter($"id" > 3), "id", "payload", n = 4, frameBytes = 96)
    // the batch operator on the SAME population, restricted to pairs
    // with a fresh side, must agree pairwise with the incremental probe
    val batchPairs = Multimodal.videoDhashNearDups(all, "id", "payload",
        n = 4, frameBytes = 96, maxHamming = 3, minShared = 3)
      .collect().flatMap(r => Seq((r.getLong(0), r.getLong(1)) -> r.getLong(2),
        (r.getLong(1), r.getLong(0)) -> r.getLong(2))).toMap
    val got = Multimodal.videoDhashNearDupsFromFresh(fresh, index,
        maxHamming = 3, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = batchPairs.filter { case ((a, _), _) => a > 3L }
    assert(expected.nonEmpty, "planted cross-side pairs must exist")
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("videoDhashNearDups: frame voting — out-of-window edit keeps all votes, " +
    "in-window edit survives perceptually, unrelated payloads never pair") {
    import org.apache.spark.sql.functions._
    val base  = (1 to 800).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    // edit inside frame 1's window (starts at 801/4 = 200): the md5 frame
    // digest would die; the perceptual hash flips ≤3 bits and still votes
    val inWin  = base.substring(0, 210) + "QQ" + base.substring(212)
    // edit between windows (frames are 96 bytes from 0/200/400/600): byte
    // 150 is sampled by NO frame → all four frames identical
    val outWin = base.substring(0, 150) + "QQ" + base.substring(152)
    val other  = (1 to 800).map(i => ('a' + (i * 11 % 26)).toChar).mkString
    val df = Seq((1L, base), (2L, inWin), (3L, outWin), (4L, other))
      .toDF("id", "payload")
    val got = Multimodal.videoDhashNearDups(df, "id", "payload",
        n = 4, frameBytes = 96, maxHamming = 3, minShared = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got=$got")
    assert(got((1L, 3L)) == ((4L, true)), "out-of-window edit: all 4 frames vote")
    assert(got((1L, 2L))._1 >= 3L, "in-window edit: at least 3 of 4 frames vote")
  }

  test("audioChromaNearDups: window voting — out-of-window edit keeps all votes, " +
    "uniform shift twins at hamming 0, unrelated payloads never pair") {
    val base  = (1 to 800).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    // every code +1: every band energy shifts by exactly 1, every
    // gradient delta — so every sub-fingerprint — is unchanged
    val twin  = base.map(c => (c + 1).toChar)
    // windows at len=800, n=6 start 1-indexed at 1/134/267/400/534/667,
    // 128 wide — bytes 130-131 land in NO window, so all 5 fps identical
    val outWin = base.substring(0, 129) + "QQ" + base.substring(131)
    val other  = (1 to 800).map(i => ('a' + (i * 11 % 26)).toChar).mkString
    val df = Seq((1L, base), (2L, twin), (3L, outWin), (4L, other))
      .toDF("id", "payload")
    val got = Multimodal.audioChromaNearDups(df, "id", "payload",
        n = 6, windowChars = 128, maxHamming = 3, minShared = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got=$got")
    assert(got((1L, 2L)) == ((5L, true)), s"uniform-shift twin must vote 5/5: $got")
    assert(got((1L, 3L)) == ((5L, true)), s"out-of-window edit must keep all votes: $got")
  }

  test("audioChromaNearDupsFromFresh: fresh-side votes agree with the batch operator") {
    val base  = (1 to 800).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val twin  = base.map(c => (c + 1).toChar)          // hamming 0 per window
    val other = (1 to 800).map(i => ('a' + (i * 11 % 26)).toChar).mkString
    val otherEd = other.substring(0, 129) + "QQ" + other.substring(131)
    // index: 1 and 3; fresh: 4 (shift twin of 1) and 6 (gap edit of 3)
    val all = Seq((1L, base), (3L, other), (4L, twin), (6L, otherEd))
      .toDF("id", "payload")
    val index = Multimodal.audioWindowFingerprints(
      all.filter($"id" <= 3), "id", "payload", n = 6)
    val fresh = Multimodal.audioWindowFingerprints(
      all.filter($"id" > 3), "id", "payload", n = 6)
    val batchPairs = Multimodal.audioChromaNearDups(all, "id", "payload",
        n = 6, windowChars = 128, maxHamming = 3, minShared = 3)
      .collect().flatMap(r => Seq((r.getLong(0), r.getLong(1)) -> r.getLong(2),
        (r.getLong(1), r.getLong(0)) -> r.getLong(2))).toMap
    val got = Multimodal.audioChromaNearDupsFromFresh(fresh, index,
        maxHamming = 3, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = batchPairs.filter { case ((a, _), _) => a > 3L }
    assert(expected.nonEmpty, "planted cross-side pairs must exist")
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("audio zero-fp discipline: structureless windows never pair at ANY block cap") {
    // single-char payloads degenerate every window to t == p → fp = 0 in
    // all 5 sub-fingerprints. Before the explicit fp ≠ 0 guard these
    // paired at hamming 0 whenever their block stayed under the cap —
    // boilerplate-as-near-dup. The guard must hold at the production cap
    // AND at an effectively-unbounded one (the raised-cap regression the
    // r12 verdict flagged), with a real twin pair as the positive control.
    val base = (1 to 800).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val twin = base.map(c => (c + 1).toChar)
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, ""),
      (10L, base), (11L, twin)).toDF("id", "payload")
    for (cap <- Seq(64, 1000000)) {
      val got = Multimodal.audioChromaNearDups(df, "id", "payload",
          n = 6, windowChars = 128, maxHamming = 3, minShared = 3,
          maxBlockSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((10L, 11L)),
        s"cap=$cap: zero-fp containers must never pair, got $got")
    }
    // the ingest-tier twin under the same discipline: zero-fp fresh rows
    // must not pair against a zero-fp (or near-zero) index at any cap
    val index = Multimodal.audioWindowFingerprints(
      df.filter($"id" <= 4 || $"id" === 10L), "id", "payload", n = 6)
    val fresh = Multimodal.audioWindowFingerprints(
      Seq((20L, "z"), (21L, twin)).toDF("id", "payload"), "id", "payload", n = 6)
    for (cap <- Seq(64, 1000000)) {
      val got = Multimodal.audioChromaNearDupsFromFresh(fresh, index,
          maxHamming = 3, minShared = 3, maxBlockSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((21L, 10L)),
        s"cap=$cap: only the real twin may pair from fresh, got $got")
    }
  }

  test("perceptual family containment: exact-md5 pairs ⊆ dHash pairs; edits widen, never swap") {
    // The q326 comparison table implies a containment nothing pinned:
    // byte-identical sampled frames (the exact-md5 vote) are hamming-0
    // dHash frames, so every md5 pair must re-appear in the dHash pairs,
    // while an in-window edit is caught by dHash and NOT md5 (strict
    // superset witness). Checked on the planted corpus and on a
    // perturbed one (every code +1 — a length-preserving global edit).
    def families(df: org.apache.spark.sql.DataFrame) = {
      val md5 = Multimodal.frameFingerprintNearDups(df, "id", "payload",
          n = 4, frameBytes = 96, minShared = 3, maxBlockSize = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dh = Multimodal.videoDhashNearDups(df, "id", "payload",
          n = 4, frameBytes = 96, maxHamming = 3, minShared = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ch = Multimodal.audioChromaNearDups(df, "id", "payload",
          n = 6, windowChars = 128, maxHamming = 3, minShared = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (md5, dh, ch)
    }
    val base   = (1 to 800).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val exact  = base                                    // byte-identical twin
    // edits inside TWO sampled frames (frames start at 0/200/400/600,
    // 96 wide): the exact family keeps only 2 of 4 digests (< minShared,
    // dropped) while each touched frame flips ≤ 3 dHash bits (all vote)
    val inWin  = base.substring(0, 210) + "QQ" + base.substring(212, 410) +
      "QQ" + base.substring(412)
    val outWin = base.substring(0, 150) + "QQ" + base.substring(152) // between frames
    val other  = (1 to 800).map(i => ('a' + (i * 11 % 26)).toChar).mkString
    val corpora = Seq(
      Seq((1L, base), (2L, exact), (3L, inWin), (4L, outWin), (5L, other)),
      // perturbed: the same corpus under a global +1 code shift
      Seq((1L, base), (2L, exact), (3L, inWin), (4L, outWin), (5L, other))
        .map { case (id, t) => (id, t.map(c => (c + 1).toChar)) })
    corpora.zipWithIndex.foreach { case (rows, ci) =>
      val (md5, dh, ch) = families(rows.toDF("id", "payload"))
      assert(md5.subsetOf(dh),
        s"corpus $ci: md5 pairs must be a subset of dHash pairs — md5=$md5 dh=$dh")
      assert(md5.subsetOf(dh.union(ch)),
        s"corpus $ci: exact pairs must survive into the perceptual union")
      // strict-superset witness: the in-window edit pairs perceptually
      // but kills the exact digest of its touched frame
      assert(dh.contains((1L, 3L)) && !md5.contains((1L, 3L)),
        s"corpus $ci: in-window edit must be dHash-only — md5=$md5 dh=$dh")
      // the out-of-window edit keeps all sampled frames identical: the
      // exact family catches it too, and containment carries it into dh
      assert(md5.contains((1L, 4L)) && dh.contains((1L, 4L)),
        s"corpus $ci: out-of-window edit must be caught by both — md5=$md5 dh=$dh")
    }
  }

  test("audioChromaSegments: boundaries only where consecutive window words jump") {
    // A-half / B-half payload: windows 1-2 sit inside the A half and 4-5
    // inside the B half (fps of a CONSTANT window are all-zero gradient
    // words → identical), so the only candidate boundaries are the
    // transitions touching the windows that straddle the A|B seam. The
    // flat container never crosses the threshold.
    val A = "a" * 400
    val B = ("zb" * 100) + ("a" * 200)
    val shot = A + B
    val flat = A + A
    val df = Seq((1L, shot), (2L, flat)).toDF("doc_id", "payload")
    val r = Multimodal.audioChromaSegments(df, "doc_id", "payload",
        n = 6, windowChars = 128, minHamming = 5)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    val (nt, nb, mx, _) = r(1L)
    assert(nt == 4L && nb >= 1L && mx >= 5L, s"expected a boundary: ${r(1L)}")
    assert(r(2L) == ((4L, 0L, 0L, 0L)), s"flat container must never cut: ${r(2L)}")
  }

  test("videoShotBoundaries: cuts only where consecutive frame fingerprints jump") {
    // payload layout: frames sample 96 chars at i*400/4 -> A A B B, so
    // the only perceptual jump is the f1->f2 transition; the flat
    // container never cuts. mean == max/3 exactly because the other two
    // transitions are hamming 0.
    val A = "a" * 96
    val B = "za" * 48
    val pad = "pppp"
    val shot = A + pad + A + pad + B + pad + B + pad
    val flat = A + pad + A + pad + A + pad + A + pad
    val df = Seq((1L, shot), (2L, flat)).toDF("doc_id", "payload")
    val r = Multimodal.videoShotBoundaries(df, "doc_id", "payload",
        n = 4, frameBytes = 96, minHamming = 12)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    val (nt, nc, mx, mean) = r(1L)
    assert(nt == 3L && nc == 1L && mx >= 12L && mean == mx * 1000 / 3)
    assert(r(2L) == ((3L, 0L, 0L, 0L)))
  }
}
