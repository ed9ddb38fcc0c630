package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkFunSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("seededUniform is the md5-32-bit value with the half-step offset") {
    val got = Seq("k1", "k2").toDF("key")
      .select(col("key"), Privacy.seededUniform(col("key"), "salt").as("u"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (k <- Seq("k1", "k2")) {
      val v = java.lang.Long.parseLong(md5hex(s"salt|$k").take(8), 16)
      assert(got(k) == (v + 0.5) / 4294967296.0)
      assert(got(k) > 0.0 && got(k) < 1.0)
    }
  }

  test("laplaceNoiseMicro replays the inverse CDF exactly and bounds the tail") {
    val keys = (0 until 50).map(i => s"key$i")
    val got = keys.toDF("key")
      .select(col("key"), Privacy.laplaceNoiseMicro(col("key"), "s", 1000000L).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      val v = java.lang.Long.parseLong(md5hex(s"s|$k").take(8), 16)
      val w = (v + 0.5) / 4294967296.0 - 0.5
      val expect = math.round(-1000000.0 * math.signum(w) * math.log(1 - 2 * math.abs(w)))
      assert(got(k) == expect, s"key $k")
      // |noise| ≤ b·ln(2^33) ≈ 22.9·b
      assert(math.abs(got(k)) <= 22900000L)
    }
    // a seeded draw is two-sided: both signs appear across 50 keys
    assert(got.values.exists(_ > 0) && got.values.exists(_ < 0))
  }

  test("deletionImpact: semi/anti counts hold the partition invariant") {
    val events = Seq((1L, "a"), (2L, "b"), (3L, "c"), (1L, "d")).toDF("uid", "x")
    val orders = Seq((2L, "o1"), (4L, "o2")).toDF("cust", "o")
    val del = Seq(1L, 2L).toDF("del_key")
    val got = Privacy.deletionImpact(
        Seq(("events", events, "uid"), ("orders", orders, "cust")), del, "del_key")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_referencing"),
          r.getAs[Long]("n_after_purge")))).toMap
    assert(got("events") == ((4L, 3L, 1L)))
    assert(got("orders") == ((2L, 1L, 1L)))
  }

  test("kAnonymityAudit and lDiversityAudit summarize class risk exactly") {
    // classes: (n1,A)×3 homogeneous, (n1,B)×1, (n2,A)×5 diverse
    val df = (Seq.fill(3)((1L, "A", 7L)) ++ Seq((1L, "B", 1L)) ++
      (1L to 5L).map(i => (2L, "A", i))).toDF("nat", "seg", "sens")
    val k = Privacy.kAnonymityAudit(df, Seq("nat", "seg"), k = 3L).collect().head
    assert(k.getAs[Long]("n_classes") == 3L && k.getAs[Long]("min_class_size") == 1L)
    assert(k.getAs[Long]("n_small_classes") == 1L && k.getAs[Long]("rows_at_risk") == 1L)
    assert(k.getAs[Long]("at_risk_bp") == 10000L / 9L)
    val l = Privacy.lDiversityAudit(df, Seq("nat", "seg"), "sens", l = 2L).collect().head
    // diversities: (n1,A)=1, (n1,B)=1, (n2,A)=5 → two classes below l=2
    assert(l.getAs[Long]("min_diversity") == 1L && l.getAs[Long]("n_low_classes") == 2L)
    assert(l.getAs[Long]("rows_in_low_classes") == 4L)
  }

  test("noisyCounts suppresses small cells and releases true_n·1e6 + noise") {
    val df = (Seq.fill(7)("a") ++ Seq.fill(3)("b")).toDF("g")
    val out = Privacy.noisyCounts(df, Seq("g"), "t", 1000000L, suppressBelow = 5L)
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a")) // b's cell of 3 suppressed
    val r = out.head
    assert(r.getAs[Long]("true_n") == 7L)
    assert(r.getAs[Long]("released_micro") ==
      7L * 1000000L + r.getAs[Long]("noise_micro"))
  }

  test("noisyCounts seed key is injective: NULL-position and separator-collision groups draw independently") {
    // (NULL,'x') vs ('x',NULL) collapse under concat_ws; ("a/b", null-ish
    // tail) vs ("a","b") collapse without separator escaping — all four
    // groups must draw DISTINCT noise
    val df = (Seq.fill(6)((null: String, "x")) ++ Seq.fill(6)(("x", null: String)) ++
      Seq.fill(6)(("a/b", "c")) ++ Seq.fill(6)(("a", "b/c")))
      .toDF("g1", "g2")
    val out = Privacy.noisyCounts(df, Seq("g1", "g2"), "t", 1000000L, suppressBelow = 1L)
      .collect()
    assert(out.length == 4)
    val draws = out.map(_.getAs[Long]("noise_micro")).toSet
    assert(draws.size == 4, s"correlated draws across distinct groups: $draws")
  }
  test("crypto-shredding: round-trip restores the payload; key deletion makes it unrecoverable") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "alpha bravo charlie"), (2L, "delta echo"), (3L, "Foxtrot 7!"))
      .toDF("uid", "payload")
    val keys = Privacy.shredKeys(docs, "uid", "secret-r10")
    val enc = Privacy.shredEncrypt(docs, "uid", "payload", keys)
    val ct = enc.collect().map(r => r.getAs[Long]("uid") -> r.getAs[String]("ciphertext")).toMap
    // ciphertext is hex, twice the payload length, and never the plaintext
    for ((id, c) <- ct) {
      assert(c.matches("[0-9a-f]+"))
      val plain = docs.filter(col("uid") === id).head().getString(1)
      assert(c.length == 2 * plain.length && !c.contains(plain))
    }
    // subject 2 exercises the right to be forgotten: one key row deleted
    val after = keys.filter(col("subject") =!= "2")
    val dec = Privacy.shredDecrypt(enc, "ciphertext", after)
      .collect().map(r => r.getAs[String]("subject") ->
        ((r.getAs[Boolean]("recoverable"), r.getAs[String]("plaintext")))).toMap
    assert(dec("1") == ((true, "alpha bravo charlie")))
    assert(dec("3") == ((true, "Foxtrot 7!")))
    assert(dec("2") == ((false, null)))
  }

  test("crypto-shredding: keys differ per subject, so identical payloads encrypt differently") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "same text"), (2L, "same text")).toDF("uid", "payload")
    val keys = Privacy.shredKeys(docs, "uid", "s")
    val ct = Privacy.shredEncrypt(docs, "uid", "payload", keys)
      .collect().map(_.getAs[String]("ciphertext"))
    assert(ct.distinct.length == 2)
  }
}
