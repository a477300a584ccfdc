package org.apache.spark.sql.graft

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{InternalRow, QueryPlanningTracker}
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, Predicate, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.{DataSourceStrategy, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Jobless parquet scan for the remote-table STORE side.
  *
  * The store endpoint must serve split reads WITHOUT scheduling work on the
  * query cluster: when server and client co-habit one SparkSession, client
  * scan tasks hold task slots while they block on the HTTP response, so a
  * serve path that needs a slot deadlocks the moment client parallelism
  * reaches the slot count (observed: 4 blocked serve jobs under 4 busy
  * slots). The reference has the same separation — fusestore's do_read is
  * a local file scan inside the store process, never a query-cluster job.
  *
  * So this class drives Spark's OWN parquet reader machinery directly on
  * the serving thread: `ParquetFileFormat.buildReaderWithPartitionValues`
  * (column pruning + row-group skipping from translated filters), the
  * session's real analyzer to resolve/coerce the pushed predicate against
  * the table schema, and an interpreted `Predicate` for exact row-level
  * semantics. Output rows carry the requested columns as a PREFIX of the
  * read schema, so the wire encoder reads them by ordinal — no projection
  * step at all.
  *
  * Lives in the `org.apache.spark.sql` namespace because the file-format
  * reader surface is `private[sql]` (same pattern as [[Bridge]]). */
object LocalScan {

  /** Reusable per-(table schema, cols, where) serving plan. Thread-safe:
    * per-request state (bound predicate) is created in [[scanFile]]. */
  final class Plan private[LocalScan] (
      val outSchema: StructType,
      private[LocalScan] val readSchema: StructType,
      private[LocalScan] val readAttrs: Seq[Attribute],
      private[LocalScan] val condition: Option[Expression],
      private[LocalScan] val reader: PartitionedFile => Iterator[InternalRow])

  private object Preds extends PredicateHelper {
    def split(e: Expression): Seq[Expression] = splitConjunctivePredicates(e)
  }

  /** Build a serving plan: resolve `where` with the session analyzer (full
    * coercion — `qty < 10L` against a double column gets the cast Catalyst
    * would insert), widen the read schema to cover predicate references,
    * translate conjuncts back to source filters for parquet row-group
    * skipping, and compile the file reader once. */
  def plan(spark: SparkSession, dataSchema: StructType, cols: Seq[String],
      where: Option[String]): Plan = {
    val attrs = DataTypeUtils.toAttributes(dataSchema)
    val byName = attrs.map(a => a.name -> a).toMap
    val condition = where.map { w =>
      val parsed = spark.sessionState.sqlParser.parseExpression(w)
      val analyzed = spark.sessionState.analyzer.executeAndCheck(
        Filter(parsed, LocalRelation(attrs)), new QueryPlanningTracker())
      analyzed.collectFirst { case Filter(c, _) => c }.getOrElse(
        throw new IllegalStateException(s"predicate did not survive analysis: $w"))
    }
    val outFields = cols.map(c => dataSchema(dataSchema.fieldIndex(c)))
    val refNames = condition.toSeq
      .flatMap(_.references.toSeq.map(_.name)).distinct
      .filterNot(cols.contains)
    // requested columns FIRST — the wire encoder reads them by ordinal
    val readSchema = StructType(outFields ++ refNames.map(n =>
      dataSchema(dataSchema.fieldIndex(n))))
    val readAttrs = readSchema.fieldNames.toSeq.map(byName)
    val sourceFilters = condition.toSeq
      .flatMap(Preds.split)
      .flatMap(DataSourceStrategy.translateFilter(_, supportNestedPredicatePushdown = true))
    val reader = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema, StructType(Nil), readSchema, sourceFilters,
      // rows, not ColumnarBatches — the serve loop encodes row-at-a-time
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConf())
    new Plan(StructType(outFields), readSchema, readAttrs, condition, reader)
  }

  /** Scan one local file under `plan` — runs entirely on the calling
    * thread. The iterator's rows may be reused buffers; consume each row
    * before calling next. */
  def scanFile(p: Plan, file: String): Iterator[InternalRow] = {
    val path = SparkPath.fromPathString(file)
    val fileLen = new java.io.File(path.toUri.getPath).length()
    val pf = PartitionedFile(InternalRow.empty, path, 0, fileLen,
      Array.empty, 0L, fileLen)
    val raw = p.reader(pf).flatMap {
      case b: org.apache.spark.sql.vectorized.ColumnarBatch =>
        import scala.jdk.CollectionConverters._
        b.rowIterator().asScala
      case r => Iterator.single(r)
    }
    p.condition match {
      case None => raw
      case Some(c) =>
        val pred = Predicate.createInterpreted(
          BindReferences.bindReference(c, p.readAttrs))
        pred.initialize(0)
        raw.filter(pred.eval)
    }
  }

  /** Jobless parquet schema read: one footer via parquet-mr + Spark's own
    * schema converter — `spark.read.parquet` schema inference can launch a
    * Spark job (parallel footer merge), which the store must never do (see
    * class doc: a serve-side job under held client task slots deadlocks). */
  def parquetFileSchema(spark: SparkSession, file: String): StructType = {
    val conf = spark.sessionState.newHadoopConf()
    val path = new org.apache.hadoop.fs.Path(SparkPath.fromPathString(file).toUri)
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf))
    // the SQLConf ctor, not the Configuration one — the latter parses conf
    // strings and chokes on unset optional entries serialized as "null"
    try new org.apache.spark.sql.execution.datasources.parquet
      .ParquetToSparkSchemaConverter(spark.sessionState.conf)
      .convert(rd.getFooter.getFileMetaData.getSchema)
    finally rd.close()
  }

  /** Jobless parquet WRITE (the commit half of the store's append path):
    * drives Spark's own `OutputWriter` on the calling thread, so landing
    * staged rows needs no task slot either. One file per call. */
  def writeParquetFile(spark: SparkSession, schema: StructType, dest: String,
      rows: Iterator[InternalRow]): Unit = {
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, schema)
    val tac = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      job.getConfiguration, new org.apache.hadoop.mapreduce.TaskAttemptID())
    val w = factory.newInstance(dest, schema, tac)
    try rows.foreach(w.write) finally w.close()
  }
}
