package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // Real injection path: kernels reach SQL via the extension, not
      // via runtime registerAll (ExtensionsSpec relies on this).
      .withExtensions(new graft.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", new java.io.File("target/testtmp/warehouse").getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Scratch dir inside the repo target (never outside /root/repo).
    * Always starts EMPTY: append-mode writers (the streaming specs'
    * micro-batch files) must not see files left by a previous sbt run —
    * stale parts change results, and a schema change would otherwise
    * poison every later run (observed with the ts long→TIMESTAMP_NTZ
    * testdata migration).
    */
  def tmpDir(name: String): String = {
    val p = java.nio.file.Paths.get("target", "testtmp", name)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      // Files.walk holds directory streams open until closed — collect
      // first so the fd is released before the deletes run.
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
        st.sorted(java.util.Comparator.reverseOrder()).iterator().asScala.toList
      }.foreach(java.nio.file.Files.delete)
    }
    java.nio.file.Files.createDirectories(p)
    p.toAbsolutePath.toString
  }
}
