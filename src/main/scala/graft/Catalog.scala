package graft

import org.apache.spark.sql.SparkSession
import graft.schema.EventSchemas

/** The reference's DDL / metadata / control surface (SURVEY.md §2.10)
  * on the Spark catalog:
  *
  *  - D1 `CREATE TABLE IF NOT EXISTS` for the two typed target tables
  *  - D3 `DROP TABLE IF EXISTS`
  *  - D5 `SHOW TABLES` / existence checks (the serving routes probe
  *    tables before every query, app.py:16-33)
  *  - D6 `SELECT 1` liveness probe (generate_data.py:39)
  *
  * (D2 materialized view ≙ a named checkpointed StreamingQuery and D4
  * DETACH/ATTACH live in [[graft.streaming.StreamingPipeline]].)
  */
object Catalog {

  val SalesTable = "sales"
  val MovementsTable = "stock_movements"

  private def ddl(schema: org.apache.spark.sql.types.StructType): String =
    schema.fields.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")

  /** D1 — create both typed target tables (path-based parquet tables,
    * partitioned like the MergeTree layout) if absent. */
  def createTargetTables(spark: SparkSession, basePath: String): Unit = {
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $SalesTable (${ddl(EventSchemas.salesTyped)},
         | event_month STRING)
         |USING parquet PARTITIONED BY (event_month)
         |LOCATION '$basePath/$SalesTable'""".stripMargin)
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $MovementsTable (${ddl(EventSchemas.warehouseTyped)},
         | event_month STRING)
         |USING parquet PARTITIONED BY (event_month)
         |LOCATION '$basePath/$MovementsTable'""".stripMargin)
  }

  /** D3 — drop (metadata only; external location survives). */
  def dropTables(spark: SparkSession): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $SalesTable")
    spark.sql(s"DROP TABLE IF EXISTS $MovementsTable")
  }

  /** D5 — existence check, as the serving routes do before querying. */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** D5 — SHOW TABLES. */
  def showTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq

  /** D6 — liveness probe: `SELECT 1` round-trips the SQL layer. */
  def isAlive(spark: SparkSession): Boolean =
    try spark.sql("SELECT 1").collect().head.getInt(0) == 1
    catch { case _: Throwable => false }

  /** Bucketed catalog table: pays the shuffle ONCE at write time so every
    * later equi-join or aggregation keyed on `bucketCol` between tables
    * with compatible bucketing is co-located — the scan itself is the
    * exchange. At 100 TB this converts the recurring fact⋈fact shuffle
    * (the single largest cost in a repeated join workload) into a
    * write-time layout decision, exactly what MergeTree's ORDER BY key
    * does for the reference. `sortCols` additionally sorts each bucket
    * file so sort-merge join can skip its per-task sort.
    * (BucketedJoinSpec asserts the no-Exchange plan.) */
  def createBucketed(
      df: org.apache.spark.sql.DataFrame, table: String,
      bucketCol: String, numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
