package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.warehouse.dir", TestTmp.dir("warehouse"))
    .getOrCreate()
}

/** Temp directories for tests, swept when the test JVM exits. Every suite
  * should mint scratch space here rather than calling
  * `Files.createTempDirectory` directly: raw temp dirs outlive the run and
  * accumulate in /tmp — and a tag like "layout" even collides with the
  * `graft-layout` prefix QueryCaches uses, making honest test scratch look
  * like a production cache leak to anyone auditing /tmp.
  */
object TestTmp {
  private val created = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()

  def dir(tag: String): String = synchronized {
    val p = java.nio.file.Files.createTempDirectory(s"graft-test-$tag")
    created += p
    p.toString
  }

  sys.addShutdownHook {
    import scala.jdk.CollectionConverters._
    synchronized {
      created.foreach { root =>
        if (java.nio.file.Files.exists(root))
          java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverseIterator
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      created.clear()
    }
  }
}

abstract class SparkFunSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
}
