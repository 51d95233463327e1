package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process.{Process, ProcessLogger}

/** Conditional CI gate for `examples/pyspark_client.py` — the exercised
  * analog of the reference's Python walkthrough
  * (python/examples/testquery.py). The reference ships a hand-built
  * Python binding; here plain PySpark against the compiled library is
  * the binding, so the gate is: where a PySpark matching the classpath
  * Spark is installed, the client must run green end-to-end (SQL set,
  * native functions through `GraftExtensions`, DataFrame API). Where it
  * is not installed — or the versions diverge, which breaks the Py4J
  * gateway by construction — the test CANCELS with the reason, never
  * silently passes: a canceled row in the report documents the skip.
  */
class PySparkClientSpec extends AnyFunSuite {

  private def pysparkVersion: Option[String] =
    try {
      val out = Process(Seq("python3", "-c",
        "import pyspark; print(pyspark.__version__)")).!!(
        ProcessLogger(_ => ())).trim
      Option(out).filter(_.nonEmpty)
    } catch { case _: Exception => None }

  test("pyspark client walkthrough runs green when a matching PySpark exists") {
    val ver = pysparkVersion
    assume(ver.nonEmpty,
      "no python3+pyspark on PATH — documented skip, JVM twin is graft.Demo")
    val jvmMajorMinor = org.apache.spark.SPARK_VERSION
      .split("\\.").take(2).mkString(".")
    assume(ver.exists(_.startsWith(jvmMajorMinor)),
      s"pyspark ${ver.get} != classpath Spark $jvmMajorMinor — gateway " +
        "would break on version skew; documented skip")
    val classes = new java.io.File("target/scala-2.13/classes")
    assume(classes.isDirectory, "compiled classes missing")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_TESTDATA",
      "/root/testdata/sf0.001")
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'): Unit,
      l => out.append(l).append('\n'): Unit)
    val code = Process(
      Seq("python3", "examples/pyspark_client.py", sfDir),
      cwd = None,
      "GRAFT_CLASSES" -> classes.getAbsolutePath).!(logger)
    assert(code == 0, s"client exited $code:\n${out.toString.takeRight(4000)}")
    val text = out.toString
    // the three capability tiers the walkthrough exercises must all report
    assert(text.contains("=== q1: 6 rows"), "TPC-H q1 tier missing")
    assert(text.contains("=== q6: 1 rows"), "TPC-H q6 tier missing")
    assert(text.contains("=== native_fns: 5 rows"),
      "native-function tier missing (GraftExtensions not injected?)")
    assert(text.contains("=== dataframe api:"), "DataFrame tier missing")
  }
}
