package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class ParagraphDedupSpec extends SparkFunSuite {
  import spark.implicits._

  // paraTokens = 2 throughout: two-token "paragraphs" keep fixtures legible.

  test("paragraphs: fixed windows, trailing partial kept, empty docs absent, keep cols carried") {
    val docs = Seq(
      (1L, "s1", "a b c d e"), // 3 paras: "a b", "c d", "e"
      (2L, "s2", "")           // zero tokens → absent
    ).toDF("id", "src", "text")
    val rows = ParagraphDedup.paragraphs(docs, "id", "text", paraTokens = 2, keep = Seq("src"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.toSet == Set((1L, "s1", 0L, "a b"), (1L, "s1", 1L, "c d"), (1L, "s1", 2L, "e")))
  }

  private lazy val corpus = Seq(
    (1L, "x y x y"),   // para "x y" twice: within-doc dup
    (2L, "x y z w"),   // "x y" first seen in doc 1 → removed; "z w" kept
    (3L, "x y"),       // its only para first seen elsewhere → nothing kept
    (4L, "p q r"),     // all unique, partial tail "r" kept
    (5L, "m n z w")    // "z w" first seen in doc 2 → removed; "m n" kept
  ).toDF("doc_id", "text")

  test("paragraphDedup: global first occurrence wins, kept_text in document order") {
    val out = ParagraphDedup.paragraphDedup(corpus, "doc_id", "text", paraTokens = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((2L, 1L, 1L, "x y")))  // second in-doc occurrence removed
    assert(out(2L) == ((2L, 1L, 1L, "z w")))
    assert(out(3L) == ((1L, 0L, 1L, "")))     // every paragraph first appeared elsewhere
    assert(out(4L) == ((2L, 2L, 0L, "p q r")))
    assert(out(5L) == ((2L, 1L, 1L, "m n")))
  }

  test("paragraphDedup: kept paragraph counts are conserved corpus-wide") {
    val out = ParagraphDedup.paragraphDedup(corpus, "doc_id", "text", paraTokens = 2)
    val (kept, paras) = (out.agg(sum("n_kept")).head.getLong(0), out.agg(sum("n_paras")).head.getLong(0))
    // distinct paragraphs: "x y", "z w", "p q", "r", "m n" — one keeper each
    assert(kept == 5L)
    assert(paras == 9L)
  }

  test("dupShingleScore: exact counts and integer permille") {
    val docs = Seq(
      (1L, "a b c d"),  // 3-grams: "a b c", "b c d"
      (2L, "a b c e"),  // 3-grams: "a b c", "b c e" → shares "a b c" with doc 1
      (3L, "q r")       // < 3 tokens → absent
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.dupShingleScore(docs, "doc_id", "text", shingleN = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 1L, 500L)))
    assert(out(2L) == ((2L, 1L, 500L)))
    assert(!out.contains(3L))
  }

  test("dupShingleScore: within-doc repeats count once (distinct shingles)") {
    val docs = Seq((1L, "a b c a b c"), (2L, "z z z")).toDF("doc_id", "text")
    val out = ParagraphDedup.dupShingleScore(docs, "doc_id", "text", shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 distinct 3-grams: "a b c", "b c a", "c a b" (each once, repeats collapse)
    assert(out(1L) == 3L)
    assert(out(2L) == 1L)
  }

  test("incrementalParagraphDedup: index suppression composes with in-batch first occurrence") {
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text") // index: "a b", "c d"
    val index = ParagraphDedup.paragraphIndex(corpus, "doc_id", "text", paraTokens = 2)
    val batch = Seq(
      (10L, "a b x y"), // "a b" indexed → removed; "x y" fresh → kept
      (11L, "x y z w"), // "x y" first seen in batch doc 10 → removed; "z w" kept
      (12L, "c d")      // fully indexed → nothing kept
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.incrementalParagraphDedup(batch, index, "doc_id", "text", paraTokens = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(out(10L) == ((2L, 1L, 1L, "x y")))
    assert(out(11L) == ((2L, 1L, 1L, "z w")))
    assert(out(12L) == ((1L, 0L, 1L, "")))
  }

  test("longestDupRun: contiguous copied passage vs scattered single dups") {
    val docs = Seq(
      (1L, "a b c d e f g h"), // shares the 5-token prefix with doc 2
      (2L, "a b c d e x q r"),
      (3L, "z z z"),           // unique everywhere → no dup run
      (4L, "a b c q q q c d e") // two SCATTERED dup shingles (pos 0 and 6)
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.longestDupRun(docs, "doc_id", "text", shingleN = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // docs 1/2: positions 0,1,2 ("a b c","b c d","c d e") duplicated → run 3,
    // span = 3 + (3-1) = 5 tokens ("a b c d e") starting at token 0
    assert(out(1L) == ((6L, 3L, 3L, 5L, 0L)))
    assert(out(2L) == ((6L, 3L, 3L, 5L, 0L)))
    assert(out(3L) == ((1L, 0L, 0L, 0L, -1L)))
    // doc 4: dup at pos 0 ("a b c") and pos 6 ("c d e"), never adjacent →
    // max_run 1, span 3, EARLIEST start on ties (0, not 6) — the cut
    // position [start, start + span) a remediation pass removes
    assert(out(4L) == ((7L, 2L, 1L, 3L, 0L)))
  }

  test("longestDupRun: tie-break picks the earliest of equal-length runs") {
    // doc 5's two dup runs both have length 1 ("m n o" at 2, "c d e" at 6);
    // doc 6 has its LONGEST run late (start 4, len 2) with a shorter dup
    // earlier (start 0, len 1) — longest must win over earliest
    val docs = Seq(
      (1L, "m n o p"), (2L, "c d e f"), (3L, "x c d e f y"),
      (5L, "q r m n o z c d e"),
      (6L, "m n o w c d e f q")
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.longestDupRun(docs, "doc_id", "text", shingleN = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(5)))).toMap
    assert(out(5L) == ((1L, 2L)))
    assert(out(6L) == ((2L, 4L)))
  }

  test("boilerplateParagraphs: source-local distinct-doc threshold") {
    val docs = Seq(
      (1L, "s1", "x y a b"),
      (2L, "s1", "x y c d"),  // "x y" in 2 distinct docs of s1 → boilerplate
      (3L, "s2", "x y e f"),  // same para, different source: only 1 doc in s2
      (4L, "s2", "q r q r")   // within-ONE-doc repeat: distinct docs = 1 → no row
    ).toDF("doc_id", "src", "text")
    val rows = ParagraphDedup.boilerplateParagraphs(docs, "doc_id", "text", "src",
        paraTokens = 2, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("s1", "x y", 2L)))
  }

  test("contentDefinedChunks: partition covers the doc; a front insertion re-syncs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, "inserted " + base), // one-token front edit of doc 1
      (3L, "completely different words entirely")
    ).toDF("doc_id", "text")
    val r = ParagraphDedup.contentDefinedChunks(docs, "doc_id", "text", anchorMod = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3), x.getBoolean(4)))
    // chunks partition each document: token counts sum back
    val perDoc = r.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perDoc(1L) == 40L && perDoc(2L) == 41L && perDoc(3L) == 4L)
    // chunk indices are contiguous from the first chunk
    val idx1 = r.filter(_._1 == 1L).map(_._2).sorted
    assert(idx1.toSeq == (idx1.min to idx1.max).toSeq)
    // insertion-robustness: every doc-1 chunk AFTER its first boundary
    // reappears verbatim in doc 2 (boundaries re-sync at the first anchor),
    // so those chunks are is_shared
    val d1 = r.filter(t => t._1 == 1L && t._2 > idx1.min)
    val d2Digests = r.filter(_._1 == 2L).map(_._4).toSet
    assert(d1.nonEmpty, "need at least one anchor in 40 tokens at mod 4")
    assert(d1.forall(t => d2Digests.contains(t._4) && t._5))
    // the unrelated doc shares nothing
    assert(r.filter(_._1 == 3L).forall(!_._5))
  }

  test("cutDupSpans removes exactly the attributed span; short spans and clean docs pass") {
    val docs = Seq(
      (1L, "u1 u2 p q r s u3"),  // shared passage at token idx 2
      (2L, "p q r s v1 v2"),     // same passage at idx 0
      (3L, "w1 w2 w3")           // clean
    ).toDF("doc_id", "text")
    val got = ParagraphDedup.cutDupSpans(docs, "doc_id", "text",
        shingleN = 2, minSpanTokens = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((7L, 2L, 4L, "u1 u2 u3")))
    assert(got(2L) == ((6L, 0L, 4L, "v1 v2")))
    assert(got(3L) == ((3L, -1L, 0L, "w1 w2 w3")))
    // a higher cut threshold leaves everything untouched
    val hi = ParagraphDedup.cutDupSpans(docs, "doc_id", "text",
        shingleN = 2, minSpanTokens = 5)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(hi(1L) == "u1 u2 p q r s u3" && hi(2L) == "p q r s v1 v2")
  }
}
