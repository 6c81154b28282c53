package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Document-store connector — parity with the reference Elasticsearch
  * transport (taskrabbit/forklift `lib/forklift/transports/elasticsearch.rb`)
  * in a zero-egress environment: an "index" is a directory of JSON-lines
  * documents. The query surface mirrors the DSL subset the reference's
  * specs exercise (SURVEY.md §2.8): `match_all`, `term` equality, `sort`,
  * `from`/`size` paging.
  */
class JsonDocConnector(val spark: SparkSession, dir: String) extends Connector {
  Files.createDirectories(Paths.get(dir))
  private def path(index: String): Path = Paths.get(dir, index + ".json")

  override def read(index: String): DataFrame = spark.read.json(path(index).toString)

  /** Query-DSL read: `search(index, Query(term=…, sort=…, from=…, size=…))`
    * ≙ `read(index, query, looping, from, size)` (`elasticsearch.rb:14-42`).
    * from/size paging maps to offset/limit — in the reference it is a
    * re-executed search per page (dup/skip under concurrent writes;
    * SURVEY §7.4#4) and here a single consistent scan. */
  def search(index: String, q: JsonDocConnector.Query): DataFrame = {
    var df = read(index)
    q.term.foreach { case (f, v) => df = df.filter(col(f) === lit(v)) }
    q.sort.foreach { case (f, asc) => df = df.orderBy(if (asc) col(f).asc else col(f).desc) }
    if (q.from > 0) df = df.offset(q.from)
    if (q.size > 0) df = df.limit(q.size)
    df
  }

  /** NOTE append/upsert here rewrite the WHOLE index — O(index), not
    * O(delta) (unlike ParquetConnector's additive file append). By
    * design: this connector is a declared parity/interchange edge for
    * small document sets; large corpora belong in parquet tables where
    * appends are file-additive and merges partition-scoped. See the
    * README gap table. */
  override def write(df: DataFrame, index: String, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val out = mode match {
      case SaveMode.Append if exists(index) => read(index).unionByName(df, allowMissingColumns = true)
      case _ => df
    }
    val tmp = Paths.get(dir, s".tmp_${index}_${System.nanoTime()}")
    out.write.mode(SaveMode.Overwrite).json(tmp.toString)
    // rollback-safe swap — a crash mid-publish never loses the index
    FileTableOps.replace(dir, tmp, path(index))
  }

  /** ES write with `update=true`: upsert by `_id`-analog pk
    * (`elasticsearch.rb:44-59`) — last writer wins per key, expressed as
    * a windowed dedup rather than per-document round-trips. */
  override def upsert(df: DataFrame, index: String, primaryKey: String = "id"): Unit = {
    if (!exists(index)) { write(df, index); return }
    val all = read(index).withColumn("_gen", lit(0))
      .unionByName(df.withColumn("_gen", lit(1)), allowMissingColumns = true)
    val w = Window.partitionBy(col(primaryKey)).orderBy(col("_gen").desc)
    write(all.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_gen", "_rn"), index)
  }

  /** `delete_index` (`elasticsearch.rb:61-64`). */
  def deleteIndex(index: String): Unit = drop(index)

  override def tables: Seq[String] = FileTableOps.list(dir, ".json")

  override def exists(index: String): Boolean = Files.exists(path(index))

  override def drop(index: String): Unit =
    if (exists(index)) FileTableOps.deleteRecursively(path(index))

  override def rename(from: String, to: String): Unit = {
    drop(to); Files.move(path(from), path(to), StandardCopyOption.ATOMIC_MOVE)
  }

  override def truncate(index: String): Unit =
    if (exists(index)) write(read(index).limit(0), index)
}

object JsonDocConnector {
  /** The query-DSL subset the reference exercises (SURVEY.md §2.8). */
  case class Query(
    term: Option[(String, Any)] = None,   // {"term": {field: value}}
    sort: Option[(String, Boolean)] = None, // [{field: {"order": "asc"}}]
    from: Int = 0,
    size: Int = 0)                        // 0 = unlimited
  val matchAll: Query = Query()
}
