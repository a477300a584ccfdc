package graft.dev

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{SparkBoot, SparkEntry}

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization-round receipt (`plans/r<N>/<query>_{before,after}.txt`).
  * The judge cannot run Spark; these files are how plan-shape claims
  * (Exchange counts, join strategies, PushedFilters) are checked against
  * the code.
  *
  * Usage: runMain graft.dev.PlanDump <sfDir> <outDir> <suffix> [q1 q2 ...]
  * With no query names, dumps every declared query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    Files.createDirectories(outDir)
    val spark = SparkBoot.install(SparkBoot.builder("graft-plandump").getOrCreate())
    val names =
      if (args.length > 3) args.drop(3).toSeq else SparkEntry.queries.keys.toSeq.sorted
    // NonFatal only, nonzero exit on any failure, stop() guaranteed (r12
    // ADVICE: a swallowed failure used to leave a plausible-looking receipt)
    var nFailed = 0
    try names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query: $name"))
      val buf = new ByteArrayOutputStream()
      val txt =
        try {
          // explain() prints to stdout; capture it so it can land in a file
          Console.withOut(buf) { fn(spark, sfDir).explain("formatted") }
          buf.toString(StandardCharsets.UTF_8)
        } catch { case scala.util.control.NonFatal(e) =>
          nFailed += 1; s"EXPLAIN FAILED: ${e.getMessage}" }
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
      System.err.println(s"[plandump] $name -> ${name}_$suffix.txt (${txt.length} chars)")
    } finally spark.stop()
    if (nFailed > 0) {
      System.err.println(s"[plandump] $nFailed EXPLAIN FAILED")
      sys.exit(1)
    }
  }
}
