package graft.queries

import graft.{SparkEntry, SparkFunSuite}

class ServingSqlSpec extends SparkFunSuite {

  test("all serving panels run and return rows") {
    ServingSql.registerViews(spark, sf)
    ServingSql.panels.keys.foreach { name =>
      assert(ServingSql.run(spark, name).count() > 0, s"panel $name empty")
    }
  }

  test("SQL trending panel equals the DataFrame-API query (q09)") {
    ServingSql.registerViews(spark, sf)
    val viaSql = ServingSql.run(spark, "trending").collect().map(_.toSeq).toSeq
    val viaDf  = SparkEntry.queries("q09_trending")(spark, sf).collect().map(_.toSeq).toSeq
    assert(viaSql == viaDf)
  }

  test("curation panels equal their DataFrame twins (q44 vocabulary, q46 hash split)") {
    ServingSql.registerViews(spark, sf)
    val vocabSql = ServingSql.run(spark, "vocabulary").collect().map(_.toSeq).toSet
    val vocabDf  = SparkEntry.queries("q44_vocab_topk")(spark, sf).collect().map(_.toSeq).toSet
    assert(vocabSql == vocabDf)
    val splitSql = ServingSql.run(spark, "train_split").collect().map(_.toSeq).toSet
    val splitDf  = SparkEntry.queries("q46_hash_split")(spark, sf).collect().map(_.toSeq).toSet
    assert(splitSql == splitDf)
  }

  test("extension functions are SQL citizens inside panels") {
    ServingSql.registerViews(spark, sf)
    val r = ServingSql.run(spark, "daily_reach_sketch").collect()
    // at sf0.001 distincts are far below k → sketch equals exact HLL-ish counts loosely
    r.foreach(row => assert(row.getLong(1) > 0))
  }
}
