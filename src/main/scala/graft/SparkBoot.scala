package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap shared by the driver-contract mains (Verify, Bench) and
  * dev tools.
  *
  * The default master is `local[cpus]` (the sandbox has one machine), but the
  * 100 TB design claim needs at least one run where task closures, broadcast
  * variables, custom Catalyst expressions and UDAF buffers cross a REAL
  * process boundary. `SPARK_GRAFT_MASTER=local-cluster[4,8,6144]` switches the
  * same binaries onto Spark's local-cluster mode: an in-process standalone
  * Master + Workers that fork genuine executor JVMs and shuffle over Netty —
  * the closest a single box gets to a multi-node cluster.
  *
  * local-cluster executors are launched from `SPARK_HOME` and know nothing of
  * this repo, so when it is selected we also ship:
  *   - `spark.executor.extraClassPath` → the classes dir this very class was
  *     loaded from (plus `SPARK_GRAFT_EXTRA_CP` if set), so graft expressions
  *     and aggregators resolve on the executor side;
  *   - `spark.executor.extraJavaOptions` → the same `--add-opens` set the
  *     driver needs on JDK 17 (Platform/Unsafe access in Tungsten).
  */
object SparkBoot {
  /** JDK-17 module opens Spark needs; mirrored to forked executors. */
  val addOpens: Seq[String] = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar"
  ).map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")

  def cpus: String = sys.env.getOrElse(
    "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)

  /** Classpath root that holds graft classes (works for target/classes and
    * for an assembled jar alike). */
  private def ownClasspath: String = {
    val self = getClass.getProtectionDomain.getCodeSource.getLocation.toURI
    new java.io.File(self).getAbsolutePath
  }

  def builder(appName: String): SparkSession.Builder = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      val cp = (ownClasspath +: sys.env.get("SPARK_GRAFT_EXTRA_CP").toSeq)
        .mkString(java.io.File.pathSeparator)
      b.config("spark.executor.extraClassPath", cp)
        .config("spark.executor.extraJavaOptions", addOpens.mkString(" "))
        // local-cluster workers inherit no SPARK_LOCAL_DIRS; keep shuffle
        // files in /tmp like the local[] runs do.
        .config("spark.local.dir", sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    } else b
  }

  def install(spark: SparkSession): SparkSession = {
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKStrategy.install(spark)
    graft.plans.CountFromStats.install(spark)
    graft.plans.RangeAggStrategy.install(spark)
    spark
  }
}
