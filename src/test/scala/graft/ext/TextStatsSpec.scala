package graft.ext

import graft.SparkFunSuite

class TextStatsSpec extends SparkFunSuite {
  import spark.implicits._

  test("tokenStats counts whitespace and subword tokens") {
    val df = Seq((1L, "the cat sat"), (2L, "ab1 cd!")).toDF("id", "text")
    val r = TextStats.tokenStats(df, "id", "text")
      .collect().map(x => x.getLong(0) -> x.toSeq.tail).toMap
    assert(r(1L) == Seq(11L, 3L, 3L, 3L))
    // "ab1 cd!" → subword: ab, 1, cd, ! = 4
    assert(r(2L) == Seq(7L, 2L, 2L, 4L))
  }

  test("qualityScore basis points and bins") {
    val df = Seq(
      (1L, "the the the the the the the the the the"), // 10 toks, all stopwords, ttr 1000bp
      (2L, "one two three")                            // short
    ).toDF("id", "text")
    val r = TextStats.qualityScore(df, "id", "text")
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getLong(4), x.getString(5)))).toMap
    assert(r(1L) == ((10L, 10000L, 1000L, "low_diversity")))
    assert(r(2L)._4 == "short")
  }

  test("domainStats rolls up URL mentions and distinct docs per domain") {
    val df = Seq(
      (1L, "see https://a.example/x and https://a.example/y plus http://b.example/z"),
      (2L, "again https://a.example/w"),
      (3L, "no urls here")
    ).toDF("id", "text")
    val r = TextStats.domainStats(df, "id", "text")
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map("a.example" -> ((2L, 3L)), "b.example" -> ((1L, 1L))))
  }

  test("langId predicts by marker hits, und on no hits") {
    val df = Seq(
      (1L, "the cat and the dog"),
      (2L, "der hund und die katze"),
      (3L, "zzz qqq www")
    ).toDF("id", "text")
    val r = TextStats.langId(df, "id", "text").collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("bpePairStats matches a hand-counted model and ranks deterministically") {
    // "abab" → ab, ba, ab ; "ab" → ab ; "cd" → cd ; single chars → none
    val df = Seq((1L, "abab ab"), (2L, "cd x y")).toDF("id", "text")
    val r = TextStats.bpePairStats(df, "text", k = 10)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("ab", 3L, 1L), ("ba", 1L, 2L), ("cd", 1L, 3L)))
  }

  private val q92Merges = Seq("er", "in", "ow", "or", "st", "me", "to", "at")
    .map(m => (m(0).toString, m(1).toString))

  test("bpeEncodeStats applies merges left-to-right, non-overlapping, in priority order") {
    // "western": w·e·s·t·e·r·n → er fuses (6 units) → st fuses (5 units);
    // "erer": e·r·e·r → er·er (2 units, non-overlapping);
    // "key": no merge fires (3 units)
    val df = Seq((1L, "western erer key")).toDF("doc_id", "text")
    val Array(r) = TextStats.bpeEncodeStats(df, "doc_id", "text", q92Merges).collect()
    val (words, chars, units, saved) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert((words, chars, units) == ((3L, 14L, 10L)))
    assert(saved == (14L - 10L) * 10000L / 14L)
  }

  test("bpeEncodeStats never merges across an already-fused unit boundary") {
    // "merit": er fuses first → [m, er, i, t]; the later 'me' merge must NOT
    // match the 'm·e' prefix inside the fused 'er' → 4 units, not 3.
    // "town": ow fuses first → [t, ow, n]; 'to' must not fire → 3 units.
    val df = Seq((1L, "merit"), (2L, "town")).toDF("doc_id", "text")
    val r = TextStats.bpeEncodeStats(df, "doc_id", "text", q92Merges)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r == Map(1L -> 4L, 2L -> 3L))
  }

  test("bpeTrain learns merges count → winner → fuse → re-count, weighted by word frequency") {
    // vocab: banana×2, ana×1.
    // r1 pairs: (a,n)=5, (n,a)=5, (b,a)=2 → tie broken lexicographically → (a,n,5)
    // r2 over [b,an,an,a]×2 + [an,a]: (an,a)=3 beats (b,an)=2, (an,an)=2
    // r3 over [b,an,ana]×2 + [ana]: (an,ana)=2 ties (b,an)=2 → 'an' < 'b'
    val df = Seq((1L, "banana banana ana")).toDF("id", "text")
    val got = TextStats.bpeTrain(df, "text", rounds = 3)
    assert(got == Seq((1L, "a", "n", 5L), (2L, "an", "a", 3L), (3L, "an", "ana", 2L)))
    // fewer fusable pairs than rounds → the table just ends early
    val tiny = Seq((1L, "x y")).toDF("id", "text")
    assert(TextStats.bpeTrain(tiny, "text", rounds = 2).isEmpty)
  }

  test("wordpieceTrain picks the likelihood winner, not the frequency winner") {
    // r1 unit counts: a=6 (ab×4, az, za), b=6 (ab×4, bz, zb), x=3, y=3,
    // z=4 (az, bz, za, zb). Pair counts: (a,b)=4, (x,y)=3, singles=1.
    // BPE would merge (a,b) (freq 4); WordPiece scores
    // (a,b): 4e9/(6·6) = 111_111_111 < (x,y): 3e9/(3·3) = 333_333_333
    // (staged: 3e9 div 3 = 1e9, div 3 = 333_333_333) → (x,y) wins.
    val df = Seq((1L, "ab ab ab ab xy xy xy az bz za zb")).toDF("id", "text")
    val got = TextStats.wordpieceTrain(df, "text", rounds = 1)
    assert(got == Seq((1L, "x", "y", 3L, 333333333L)))
    // r2: xy is fused; unit counts xy=3, a=6, b=6, z=4 → (a,b) now wins
    // with 4e9 div 6 div 6 = 111_111_111 (666_666_666 div 6).
    val got2 = TextStats.wordpieceTrain(df, "text", rounds = 2)
    assert(got2(1) == ((2L, "a", "b", 4L, 111111111L)))
    // fewer fusable pairs than rounds → the table just ends early
    val tiny = Seq((1L, "x y")).toDF("id", "text")
    assert(TextStats.wordpieceTrain(tiny, "text", rounds = 2).isEmpty)
  }

  test("bpeEncodeStats fuses multi-character units from a learned table") {
    // Two rounds of a real trainer on "tester": ('e','r') → [t,e,s,t,er],
    // then ('t','er') → [t,e,s,ter]; the pair ('s','t') must not fire on
    // the 't' inside the fused 'ter'.
    val df = Seq((1L, "tester")).toDF("doc_id", "text")
    val Array(r) = TextStats.bpeEncodeStats(df, "doc_id", "text",
      Seq(("e", "r"), ("t", "er"), ("s", "t"))).collect()
    assert(r.getLong(3) == 4L)
  }

  test("bigramFluency scores by corpus-trained conditional permille; short docs absent") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams "a b","b a","a b"
      (2L, "a c"),     // bigram "a c"
      (3L, "z")        // no bigram → absent
    ).toDF("doc_id", "text")
    // model: c("a b")=2, c("b a")=1, c("a c")=1; prefix c(a)=3, c(b)=1
    // p("a b") = 2000 div 3 = 666; p("b a") = 1000; p("a c") = 333
    val out = TextStats.bigramFluency(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((3L, 666L + 1000L + 666L, (666L + 1000L + 666L) / 3L)))
    assert(out(2L) == ((1L, 333L, 333L)))
    assert(!out.contains(3L))
  }

  test("tokenSpectrum counts types per occurrence count") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a d")).toDF("doc_id", "text")
    // counts: a=4, b=2, c=1, d=1 → spectrum {4→1, 2→1, 1→2}
    val out = TextStats.tokenSpectrum(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(4L -> 1L, 2L -> 1L, 1L -> 2L))
  }

  test("goodTuring: r* from the spectrum, unseen mass, absent r+1 → 0") {
    val docs = Seq((1L, "a a a a b b c"), (2L, "a d")).toDF("doc_id", "text")
    // counts: a=5, b=2, c=1, d=1 → spectrum {5→1, 2→1, 1→2}; N=9, N1=2
    val out = TextStats.goodTuring(docs, "text", maxR = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // r=1: r* = 2·N2·1000/N1 = 2·1·1000/2 = 1000; p0 = 2e6/9 = 222222
    assert(out(1L) == ((2L, 1L, 1000L, 222222L)))
    // r=2: N3 = 0 → r* = 0
    assert(out(2L) == ((1L, 0L, 0L, 222222L)))
    // r=5: N6 = 0 → r* = 0
    assert(out(5L) == ((1L, 0L, 0L, 222222L)))
    assert(out.size == 3)
  }

  test("goodTuring: maxR cuts the frame") {
    val docs = Seq((1L, "a a a a b")).toDF("doc_id", "text")
    val out = TextStats.goodTuring(docs, "text", maxR = 2)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L)) // a=4 is above the cut, b=1 stays
  }

  test("burstiness: cf/df permille, minDf filter, cf-desc tie-broken order") {
    val docs = Seq(
      (1L, "the the cat"), (2L, "the dog"), (3L, "the zz zz zz")
    ).toDF("doc_id", "text")
    // the: df=3 cf=4 → 1333; zz: df=1 (cut at minDf=2); cat/dog: df=1 (cut)
    val out = TextStats.burstiness(docs, "doc_id", "text", minDf = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("the", 3L, 4L, 1333L)))
    val all = TextStats.burstiness(docs, "doc_id", "text", minDf = 1L, k = 3)
      .collect().map(_.getString(0)).toSeq
    // cf: the=4, zz=3, cat=dog=1 → top-3 tie on cf=1 resolves by token
    assert(all == Seq("the", "zz", "cat"))
  }

  test("keyness: hand-computed G² in milli-nats, per-source top-k, tie order") {
    val docs = Seq(
      (1L, "s1", "x x x y"), (2L, "s2", "y y y y")
    ).toDF("doc_id", "src", "text")
    // contingency for (s1, x): a=3 b=0 c=1 d=4, margins a+b=3 c+d=5 a+c=4
    // b+d=4, N=8. milli-nat xlnx: 3·1099=3297, 0, 0, 4·1386=5544,
    // 8·2079=16632; margins 3297, 5·1609=8045, 4·1386=5544, 5544.
    // G² = 2·(3297+0+0+5544+16632−3297−8045−5544−5544) = 2·3043 = 6086
    val out = TextStats.keyness(docs, "src", "text", k = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("s1") == (("x", 3L, 3L, 4L, 6086L)))
    // (s2, y): a=4 b=1 c=0 d=3 → same table transposed → same G²
    assert(out("s2") == (("y", 4L, 5L, 4L, 6086L)))
  }

  test("lexicalDiversity: per-source mass, vocab, hapax, integer ratios") {
    val docs = Seq(
      (1L, "s1", "a a b"),   // s1: tokens 5, types {a:3, b:1, c:1} → hapax 2
      (2L, "s1", "a c"),
      (3L, "s2", "x x x x") // s2: tokens 4, types {x:4} → hapax 0
    ).toDF("doc_id", "src", "text")
    val out = TextStats.lexicalDiversity(docs, "src", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("s1") == ((5L, 3L, 2L, 600L, 666L)))
    assert(out("s2") == ((4L, 1L, 0L, 250L, 0L)))
  }

  test("canonicalUrl collapses scheme, www, host case, query, fragment, trailing slash") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "http://www.Ex.COM/a/b"            -> "https://ex.com/a/b",
      "https://ex.com/a/b/"              -> "https://ex.com/a/b",
      "https://ex.com/a/b?utm_source=x"  -> "https://ex.com/a/b",
      "https://ex.com/a/b#frag"          -> "https://ex.com/a/b",
      "http://WWW.ex.com/a/b?q=1&r=2#f"  -> "https://ex.com/a/b",
      "https://ex.com"                   -> "https://ex.com",
      "https://ex.com/"                  -> "https://ex.com",
      // www2 is a real host prefix, not the www. alias — must survive
      "https://www2.ex.com/x"            -> "https://www2.ex.com/x")
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), TextStats.canonicalUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (raw, want) =>
      assert(got(raw) == want, s"canonicalUrl($raw) = ${got(raw)}, want $want")
    }
  }

  test("canonicalUrl: every scheme×host-case×www×suffix variant collapses; canonical form is a fixpoint") {
    import org.apache.spark.sql.functions.col
    val variants = for {
      scheme <- Seq("http://", "https://")
      host   <- Seq("ex.com", "www.ex.com", "EX.com", "WWW.Ex.CoM")
      tail   <- Seq("/a/b", "/a/b/", "/a/b//", "/a/b?utm_source=x&gclid=1",
                    "/a/b#frag", "/a/b/?q=1#f")
    } yield scheme + host + tail
    val out = variants.toDF("u")
      .select(TextStats.canonicalUrl(col("u")).as("c"),
        TextStats.canonicalUrl(TextStats.canonicalUrl(col("u"))).as("cc"))
      .collect()
    out.foreach { r =>
      assert(r.getString(0) == "https://ex.com/a/b", s"collapse broke: ${r.getString(0)}")
      assert(r.getString(1) == r.getString(0), "canonical form must be a fixpoint")
    }
  }

  test("perplexityBuckets: hand-computed scores, histogram-cutoff thirds per source") {
    // model over the WHOLE corpus: "a b"×2, "a c"×1 → prefix a=3 →
    // p(a b)=666, p(a c)=333; "p q"×1 → prefix p=1 → p(p q)=1000
    val df = Seq(
      (1L, "s", "a b"), (2L, "s", "a b"), (3L, "s", "a c"), (4L, "s", "x"),
      (5L, "t", "p q"), (6L, "t", "r")
    ).toDF("doc_id", "source", "text")
    val r = TextStats.perplexityBuckets(df, "doc_id", "source", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(2), x.getString(3)))).toMap
    // source s histogram desc: 666 (n=2, cum_before 0 → head),
    // 333 (cum_before 2, 6<8 → middle), 0 (cum_before 3 → tail)
    assert(r(1L) == ((666L, "head")))
    assert(r(2L) == ((666L, "head")))
    assert(r(3L) == ((333L, "middle")))
    assert(r(4L) == ((0L, "tail")))
    // source t: 1000 (cum_before 0 → head), 0 (cum_before 1, 3<4 → middle)
    assert(r(5L) == ((1000L, "head")))
    assert(r(6L) == ((0L, "middle")))
  }

  test("cms: wide grid returns exact counts; width=1 collapses to total token mass") {
    val df = Seq((1L, "a a a b"), (2L, "b c")).toDF("id", "text")
    // width 65536 → collisions among {a,b,c}×4 seeds are practically
    // impossible (deterministic for these fixed tokens) → est == true
    val wide = TextStats.cmsCounters(df, "text", depth = 4, width = 65536)
    val probes = Seq("a", "b", "c", "zz").toDF("token")
    val est = TextStats.cmsEstimate(wide, probes, "token", depth = 4, width = 65536)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "zz" -> 0L))
    // width 1: every token shares the one bucket per seed → est = 6 for
    // every present token (total mass), still an overestimate, never under
    val narrow = TextStats.cmsCounters(df, "text", depth = 4, width = 1)
    val est1 = TextStats.cmsEstimate(narrow, probes, "token", depth = 4, width = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est1 == Map("a" -> 6L, "b" -> 6L, "c" -> 6L, "zz" -> 6L))
  }

  test("cms: grids merge by cell-wise addition — grid(A) + grid(B) == grid(A ∪ B)") {
    val a = Seq((1L, "a a b x"), (2L, "c y")).toDF("id", "text")
    val b = Seq((3L, "a b z"), (4L, "c c q")).toDF("id", "text")
    def grid(df: org.apache.spark.sql.DataFrame) =
      TextStats.cmsCounters(df, "text", depth = 3, width = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (grid(a).toSeq ++ grid(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged == grid(a.unionByName(b)))
  }

  test("gopherSignals: hand-computed integers and the combined pass flag") {
    val df = Seq(
      (1L, "the cat sat on the mat"), // 6 toks, 17 chars, "the" only stopword, all bigrams unique
      (2L, "go go go go"),            // top-2-gram "go go"×3 of 3 → 1000 permille
      (3L, "a!")                      // symbol token; no bigrams → top2 coalesces to 0
    ).toDF("doc_id", "text")
    val r = TextStats.gopherSignals(df, "doc_id", "text",
        minTokens = 5L, minStopTypes = 1L)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getBoolean(6)))).toMap
    assert(r(1L) == ((6L, 283L, 0L, 1L, 200L, true)))   // 1700 div 6 = 283; 1000 div 5 = 200
    assert(r(2L) == ((4L, 200L, 0L, 0L, 1000L, false))) // short, no stopwords, repeated bigram
    assert(r(3L) == ((1L, 200L, 1000L, 0L, 0L, false))) // "a!" ≠ stopword "a"; symbol ratio kills it
  }

  test("curriculumOrder: hand-computed difficulty, per-source ntile cuts, dense positions") {
    // srcA, 4 docs with strictly increasing difficulty:
    //   "aa aa"        chars=5  tok=2 dist=1 → 2500 + 500  = 3000
    //   "abc abc"      chars=7  tok=2 dist=1 → 3500 + 500  = 4000
    //   "abcd efgh"    chars=9  tok=2 dist=2 → 4500 + 1000 = 5500
    //   "abcdef ghijkl" chars=13 tok=2 dist=2 → 6500 + 1000 = 7500
    val df = Seq(
      (1L, "aa aa", "srcA"), (2L, "abc abc", "srcA"),
      (3L, "abcd efgh", "srcA"), (4L, "abcdef ghijkl", "srcA"),
      (5L, "zz zz", "srcB"), (6L, "", "srcB")
    ).toDF("doc_id", "text", "source")
    val r = TextStats.curriculumOrder(df, "doc_id", "text", "source", stages = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1L)._1 == 3000L && r(2L)._1 == 4000L && r(3L)._1 == 5500L && r(4L)._1 == 7500L)
    // srcA ntile(2) over 4 docs: two easiest → stage 1, two hardest → stage 2
    assert(r(1L)._2 == 1L && r(2L)._2 == 1L && r(3L)._2 == 2L && r(4L)._2 == 2L)
    // srcB: empty text scores 0 and sorts first
    assert(r(6L) == ((0L, 1L, 0L)) && r(5L)._2 == 2L)
    // positions are dense 0..n-1 within each (source, stage)
    assert(Set(r(1L)._3, r(2L)._3) == Set(0L, 1L))
    assert(Set(r(3L)._3, r(4L)._3) == Set(0L, 1L))
  }

  test("curriculumOrder: stage cuts are per-source, not global") {
    // srcB's hardest doc is easier than srcA's easiest — it must still
    // land in srcB's top stage
    val df = Seq(
      (1L, "abcdefgh ijklmnop", "srcA"), (2L, "abcdefghij klmnopqrst", "srcA"),
      (3L, "a b", "srcB"), (4L, "ab cd", "srcB")
    ).toDF("doc_id", "text", "source")
    val r = TextStats.curriculumOrder(df, "doc_id", "text", "source", stages = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(3L) == 1L && r(4L) == 2L)
    assert(r(1L) == 1L && r(2L) == 2L)
  }

  test("bpeFertility: hand-computed units per group; agrees with per-doc encode stats") {
    // merges (e,r) then (i,n): "finer" → f·i·n·er → f·in·er (3 units);
    // "er" → er (1 unit); "in" → in (1 unit); "xx" → x·x (2 units)
    val df = Seq(
      (1L, "finer er", "aa"),
      (2L, "in xx", "bb")
    ).toDF("doc_id", "text", "lang")
    val merges = Seq(("e", "r"), ("i", "n"))
    val r = TextStats.bpeFertility(df, "lang", "text", merges)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    // aa: words 2, chars 7, units 3+1=4, fertility 4·1000 div 2 = 2000,
    // chars/unit 7·1000 div 4 = 1750
    assert(r("aa") == ((2L, 7L, 4L, 2000L, 1750L)))
    // bb: words 2, chars 4, units 1+2=3 → 1500, 1333
    assert(r("bb") == ((2L, 4L, 3L, 1500L, 1333L)))
    // the group roll-up is exactly the per-doc stats re-aggregated
    val perDoc = TextStats.bpeEncodeStats(df, "doc_id", "text", merges)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(perDoc(1L) == ((2L, 7L, 4L)) && perDoc(2L) == ((2L, 4L, 3L)))
  }

  test("tokenDrift: zero on identical distributions, ~2e6 on disjoint support") {
    // cohorts with the SAME token multiset → every bucket share matches
    val same = Seq(
      (1L, "x y z x", "s", true), (2L, "x y z x", "s", false)
    ).toDF("doc_id", "text", "source", "a")
    val r0 = TextStats.tokenDrift(same, "text", "source", "a")
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3))).head
    assert(r0 == ((4L, 4L, 0L)))

    // disjoint vocabularies → all mass moves: drift = ΣpA + ΣpB, which is
    // 2e6 up to per-bucket floor loss (< buckets ppm per cohort)
    val disjoint = Seq(
      (1L, "aa bb cc dd ee", "s", true), (2L, "ff gg hh ii kk", "s", false)
    ).toDF("doc_id", "text", "source", "a")
    val r1 = TextStats.tokenDrift(disjoint, "text", "source", "a")
      .collect().map(x => x.getLong(3)).head
    assert(r1 > 2000000L - 128L && r1 <= 2000000L, s"drift_ppm = $r1")

    // a one-token shift in one cohort moves exactly 2×(share delta)
    val shifted = Seq(
      (1L, "x x x y", "s", true), (2L, "x x x x", "s", false)
    ).toDF("doc_id", "text", "source", "a")
    val r2 = TextStats.tokenDrift(shifted, "text", "source", "a")
      .collect().map(x => x.getLong(3)).head
    // A: x 750000, y 250000; B: x 1000000 → |750000−1000000| + 250000
    assert(r2 == 500000L)
  }

  test("regexFlagStats: per-flag counts from one corpus, multi-flag docs count in each") {
    val df = Seq(
      (1L, "copyright (c) 2020 acme", "a"),
      (2L, "all rights reserved twice: all rights reserved", "a"),
      (3L, "plain text", "a"),
      (4L, "copyright (c) 1999 x, all rights reserved", "b")
    ).toDF("doc_id", "text", "source")
    val r = TextStats.regexFlagStats(df, "text", "source", Seq(
      "copyright" -> "copyright \\(c\\) [0-9]{4}",
      "rights" -> "all rights reserved"))
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r(("a", "copyright")) == ((3L, 1L, 1L, 3333L)))
    assert(r(("a", "rights")) == ((3L, 1L, 2L, 3333L))) // doc 2 hits twice
    assert(r(("b", "copyright")) == ((1L, 1L, 1L, 10000L)))
    assert(r(("b", "rights")) == ((1L, 1L, 1L, 10000L)))
  }

  test("blocklistStats: exact token membership, not substring") {
    val df = Seq(
      (1L, "clean text here", "a"),
      (2L, "this has dup inside", "a"),
      (3L, "dup dup everywhere dup", "a"),
      (4L, "duplicate is NOT a hit", "b"), // substring must not fire
      (5L, "stale data", "b")
    ).toDF("doc_id", "text", "source")
    val r = TextStats.blocklistStats(df, "doc_id", "text", "source", Seq("dup", "stale"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("a") == ((3L, 2L, 4L, 6666L)))
    assert(r("b") == ((2L, 1L, 1L, 5000L)))
  }

  test("featureHashing: deterministic dims/signs, counts add, no vocabulary") {
    val docs = Seq((1L, "x"), (2L, "x x x"), (3L, "x y")).toDF("doc_id", "text")
    val out = TextStats.featureHashing(docs, "doc_id", "text", dims = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // token x always lands on the same (dim, sign): doc 2 = 3 × doc 1
    val d1 = out.collect { case ((1L, d), w) => (d, w) }
    assert(d1.size == 1)
    val (xDim, xW) = d1.head
    assert(math.abs(xW) == 1L)
    assert(out((2L, xDim)) == 3L * xW)
    // doc 3 holds x's component plus y's (same dim → they sum; else two rows)
    val d3 = out.collect { case ((3L, d), w) => (d, w) }
    assert(d3.map(_._1).forall(d => d >= 0 && d < 32))
    // total signed mass of doc 3 = x's sign + y's sign (y's is ±1)
    assert(Set(xW - 1L, xW + 1L).contains(d3.map(_._2).sum))
  }

  test("cooccurrenceTop: unordered pairs, 1000/d distance credit, tie order") {
    val docs = Seq((1L, "a b c"), (2L, "b a")).toDF("doc_id", "text")
    val out = TextStats.cooccurrenceTop(docs, "text", window = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc 1: (a,b)@1000, (b,c)@1000, (a,c)@500; doc 2 adds (a,b)@1000 unordered
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 2000L),
      ("b", "c", 1L, 1000L),
      ("a", "c", 1L, 500L)))
  }

  test("tokenBurstiness: mean within-doc frequency given presence") {
    val docs = Seq((1L, "x x x y"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextStats.tokenBurstiness(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("x", 2L, 4L, 2000L), ("y", 2L, 2L, 1000L)))
  }

  test("interpolatedFluency: unigram backoff carries unseen bigrams") {
    val train = Seq((10L, "a b a b")).toDF("doc_id", "text")
    val test  = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = TextStats.interpolatedFluency(test,
        TextStats.bigramModel(train, "text"),
        TextStats.unigramModel(train, "text"),
        "doc_id", "text", lambdaPermille = 800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // "a b": p = 1000, q(b) = 500 → (800·1000 + 200·500)/1000 = 900
    // "b c": unseen bigram AND unseen suffix → 0; mean = 450
    assert(out.toSeq == Seq((1L, 2L, 450L)))
  }

  test("pmiCollocations: exact integer PMI ratio, minCount filter, tie order") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    // unigrams: a×3, b×2, c×1, N=6; bigrams: "a b"×2, "a c"×1
    val all = TextStats.pmiCollocations(docs, "text", minCount = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // both score (c12·N·10⁴)/(c1·c2) = 20000 → tie broken by bigram asc
    assert(all.toSeq == Seq(
      ("a b", 2L, 3L, 2L, 20000L),
      ("a c", 1L, 3L, 1L, 20000L)))
    // the hapax pair drops under minCount = 2
    val filtered = TextStats.pmiCollocations(docs, "text", minCount = 2L, k = 10)
      .collect().map(_.getString(0))
    assert(filtered.toSeq == Seq("a b"))
  }

  test("oovCurve: frequency-ranked coverage with alphabetical tie-break") {
    val docs = Seq((1L, "a a a b b c"), (2L, "d d")).toDF("id", "text")
    // freqs: a=3, d=2, b=2, c=1; ranks (freq desc, token asc): a,b,d,c; N=8
    val got = TextStats.oovCurve(docs, "text", tiers = Seq(1, 2, 3))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((8L, 5L, 6250L))) // only 'a' in vocab → b,d,c OOV
    assert(got(2L) == ((8L, 3L, 3750L))) // a,b in → d,c OOV (tie b<d)
    assert(got(3L) == ((8L, 1L, 1250L))) // only c OOV
  }

  test("zipfFit reproduces the exact-integer OLS from milli-nat points") {
    // freqs: a=8, b=4, c=2, d=1 at ranks 1..4
    val docs = Seq((1L, ("a " * 8 + "b " * 4 + "c c d").trim)).toDF("id", "text")
    val r = TextStats.zipfFit(docs, "text", topN = 4).collect().head
    // independent recomputation of the documented fixed-point formula
    val pts = Seq(1L -> 8L, 2L -> 4L, 3L -> 2L, 4L -> 1L).map { case (rk, f) =>
      (math.round(math.log(rk.toDouble) * 1000), math.round(math.log(f.toDouble) * 1000))
    }
    val n  = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
    val slope = num * 1000000L / den
    assert(r.getAs[Long]("n_points") == 4L)
    assert(r.getAs[Long]("slope_micro") == slope)
    assert(slope < -1000000L && slope > -2000000L) // steeper than -1: f halves per rank step
    assert(r.getAs[Long]("intercept_micro") ==
      (sy * 1000000L / n - slope * sx / n) / 1000L)
    val r2 = num.toDouble * num.toDouble * 10000.0 / (den.toDouble * (n * syy - sy * sy).toDouble)
    assert(r.getAs[Long]("r2_bp") == math.round(r2))
  }

  test("heapsCurve counts first-appearance vocabulary per doc-count checkpoint") {
    val docs = Seq((0L, "a b"), (1L, "a c"), (2L, "d")).toDF("doc_id", "text")
    val got = TextStats.heapsCurve(docs, "doc_id", "text", Seq(1L, 2L, 3L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((2L, 2L)), 2L -> ((3L, 4L)), 3L -> ((4L, 5L))))
  }

  test("looSourceValue: total-minus-group algebra, null loo for a lone source") {
    // A: ttrs 10000 ("a b") and 5000 ("a a"); B: 10000 ("c")
    val docs = Seq(("A", "a b"), ("A", "a a"), ("B", "c")).toDF("source", "text")
    val got = TextStats.looSourceValue(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("A"); val b = got("B")
    assert(a.getAs[Long]("n_docs") == 2L && a.getAs[Long]("mean_bp") == 7500L)
    assert(a.getAs[Long]("overall_bp") == 25000L / 3L)
    assert(a.getAs[Long]("loo_bp") == 10000L)   // B alone
    assert(a.getAs[Long]("delta_bp") == 25000L / 3L - 10000L) // A drags TTR down
    assert(b.getAs[Long]("loo_bp") == 7500L && b.getAs[Long]("delta_bp") == 833L)
    val lone = TextStats.looSourceValue(
      Seq(("only", "x y")).toDF("source", "text"), "source", "text").collect().head
    assert(lone.isNullAt(lone.fieldIndex("loo_bp")))
  }

  test("wordCoocEdges: positional pairs both directions, self-pairs dropped") {
    val docs = Seq("a b", "a c").toDF("text")
    val edges = TextStats.wordCoocEdges(docs, "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(edges == Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")))
    // window 2 over "x y x": (x,y),(y,x) twice from d=1; (x,x) filtered
    val rep = TextStats.wordCoocEdges(Seq("x y x").toDF("text"), "text", 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(rep == Seq(("x", "y"), ("x", "y"), ("y", "x"), ("y", "x")))
  }

  test("kneserNeyFluency: discount, continuation backoff, and unseen-context branches") {
    val train = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val test = Seq((10L, "a b x"), (11L, "c a")).toDF("doc_id", "text")
    // model: c(a,b)=2 c(b,a)=1 c(b,c)=1; c_u(a)=2 n1f(a)=1; c_u(b)=2
    // n1f(b)=2; N1+(·a)=N1+(·b)=N1+(·c)=1; N1+(··)=3 → pcont = 333333 µ
    val got = TextStats.kneserNeyFluency(train, test, "doc_id", "text", 750L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // (a,b): (2000−750)·1000÷2 + 750·1·333333÷2000 = 625000+124999 = 749999
    // (b,x): seen context, unseen w → 0 ; doc mean = 749999 ÷ 2
    assert(got(10L) == ((2L, 374999L)))
    // (c,a): unseen context → pure continuation 333333
    assert(got(11L) == ((1L, 333333L)))
  }

  test("textRankKeywords: one exact-integer iteration over the star graph") {
    // graph a↔b, a↔c: odeg(a)=2, odeg(b)=odeg(c)=1; after one iteration
    // a = 150000 + 85%·(2·1000000) = 1850000, b = c = 150000 + 85%·500000
    val docs = Seq("a b", "a c").toDF("text")
    val got = TextStats.textRankKeywords(docs, "text", window = 2, iters = 1, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 1850000L), ("b", 575000L), ("c", 575000L)))
  }

  test("tokenEntropy: degenerate, uniform, and skewed docs in exact milli-nats") {
    val docs = Seq(
      (1L, "a a a a"), // one token type: H = 0, ratio 0 by convention
      (2L, "a b c d"), // uniform: H = ln 4 = 1386 m-nats, ratio 10000
      (3L, "a a b")    // skewed: 1099 - (2*693) div 3 = 1099 - 462 = 637
    ).toDF("doc_id", "text")
    val got = TextStats.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((4L, 1L, 0L, 0L)))
    assert(got(2L) == ((4L, 4L, 1386L, 10000L)))
    // ratio = 637*10000 div round(ln(2)*1000) = 6370000 div 693 = 9191
    assert(got(3L) == ((3L, 2L, 637L, 9191L)))
  }

  test("bpeFertilityCurve: exact per-tier fertility, monotone down from the char anchor") {
    val docs = Seq("lower lowest").toDF("text")
    val merges = Seq(("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
      ("s", "t"), ("m", "e"), ("t", "o"), ("a", "t"))
    val got = TextStats.bpeFertilityCurve(docs, "text", merges, Seq(0, 2, 4, 8))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // tier 0: character anchor — 11 units over 2 words
    assert(got(0L) == ((2L, 11L, 5500L, 0L)))
    // tier 2 ((e,r),(i,n)): lower -> l·o·w·er (4), lowest unchanged (6)
    assert(got(2L) == ((2L, 10L, 5000L, 909L)))
    // tier 4 adds (o,w): lower -> l·ow·er (3), lowest -> l·ow·e·s·t (5)
    assert(got(4L) == ((2L, 8L, 4000L, 2727L)))
    // tier 8 adds (s,t): lowest -> l·ow·e·st (4)
    assert(got(8L) == ((2L, 7L, 3500L, 3636L)))
  }

  test("sourceDivergence: identical sources read 0; disjoint supports read ~ln 2") {
    val docs = Seq(
      ("s1", "alpha beta gamma delta"),
      ("s2", "alpha beta gamma delta"),  // identical distribution to s1
      ("s3", "epsilon zeta eta theta")   // disjoint token support
    ).toDF("source", "text")
    // 65536 buckets so these 8 fixed tokens cannot plausibly collide
    val got = TextStats.sourceDivergence(docs, "source", "text", buckets = 65536)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(got(("s1", "s2")) == 0L)
    // disjoint: each side contributes Sum p*(ln 2p - ln p) ~ ln 2 per
    // distribution; quantization moves each bucket's log delta by <= 1
    assert(got(("s1", "s3")) > 690000L && got(("s1", "s3")) < 696000L)
    assert(got(("s2", "s3")) == got(("s1", "s3")))
  }

  test("unigramTrain: frequent whole-word pieces absorb their substrings; chars survive with zero usage") {
    val docs = Seq(("d1", "abab abab"), ("d2", "abab cd cd")).toDF("id", "text")
    val v = TextStats.unigramTrain(docs, "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // maximal munch covers 'abab' in one piece, so ab/ba/aba/bab get zero
    // usage in round 1 and the prune drops them; chars are never pruned
    assert(v.keySet == Set("a", "b", "c", "d", "abab", "cd"))
    assert(v("abab") == ((3L, 1L)) && v("cd") == ((2L, 2L)))
    assert(Seq("a", "b", "c", "d").forall(c => v(c)._1 == 0L))
  }

  test("unigramFertility: greedy maximal munch counts units left to right") {
    val vocab = Seq("a", "b", "c", "ab").toDF("piece")
    val docs = Seq(("g", "abcab abcab"), ("g", "cc")).toDF("grp", "text")
    val got = TextStats.unigramFertility(docs, "grp", "text", vocab)
      .collect().head
    // 'abcab' → ab|c|ab = 3 units (×2 words), 'cc' → c|c = 2 units
    assert(got.getAs[Long]("n_words") == 3L)
    assert(got.getAs[Long]("n_char_units") == 12L)
    assert(got.getAs[Long]("n_units") == 8L)
    assert(got.getAs[Long]("fertility_milli") == 8000L / 3L)
  }

  test("unigramFertility: a frozen vocab missing corpus chars still walks exactly (UNK-per-char)") {
    // vocab covers 'a'/'ab' but NOT 'y' or 'z' — before the coverage
    // union the positional fold silently mis-indexed the winners array;
    // now unknown chars segment as their own units: 'aby' → ab|y (2),
    // 'zz' → z|z (2)
    val vocab = Seq("a", "ab").toDF("piece")
    val docs = Seq(("g", "aby aby zz")).toDF("grp", "text")
    val got = TextStats.unigramFertility(docs, "grp", "text", vocab)
      .collect().head
    assert(got.getAs[Long]("n_words") == 3L)
    assert(got.getAs[Long]("n_char_units") == 8L)
    assert(got.getAs[Long]("n_units") == 6L)
    assert(got.getAs[Long]("fertility_milli") == 2000L)
    assert(got.getAs[Long]("chars_per_unit_milli") == 8000L / 6L)
  }
}
