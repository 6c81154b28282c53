package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the de-facto distribution format of public
  * LLM corpora (C4, The Pile, Dolma all ship as one-JSON-object-per-
  * line shards). Spark's json reader/writer IS the jsonl codec, so
  * this connector is the CSV transport's sibling
  * (`lib/forklift/transports/csv.rb` parity shape): schema-inferring
  * read (or caller-pinned via `schemaFor` — inference re-scans the
  * data, so production ingest should pin), truncate-on-overwrite,
  * append with schema evolution through the [[SchemaInfer]] lattice.
  *
  * Scale note: like CSV, jsonl is the interchange edge, not the
  * analytics format — read once, land in parquet. Reads parallelize
  * per line-split (newline-delimited objects make byte-range splits
  * safe); compressed shards (.gz) split per FILE, so many medium
  * shards beat one giant one — the standard public-corpus layout.
  */
class JsonlConnector(val spark: SparkSession, dir: String,
                     schemaFor: String => Option[StructType] = _ => None)
    extends Connector {
  Files.createDirectories(Paths.get(dir))
  private def path(table: String): Path = Paths.get(dir, table + ".jsonl")

  override def read(table: String): DataFrame = {
    val r = spark.read
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSS]")
    schemaFor(table) match {
      case Some(s) => r.schema(s).json(path(table).toString)
      case None => r.json(path(table).toString)
    }
  }

  /** NOTE append rewrites the WHOLE table — O(table), not O(delta): the
    * evolve/union pass re-reads existing rows so inferred types stay
    * consistent (the CsvConnector trade, same interchange-edge
    * justification). */
  override def write(df: DataFrame, table: String, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val out = mode match {
      case SaveMode.Append if exists(table) =>
        val merged = SchemaInfer.merge(read(table).schema, df.schema)
        SchemaInfer.evolve(read(table), merged).unionByName(SchemaInfer.evolve(df, merged))
      case _ => df
    }
    val tmp = Paths.get(dir, s".tmp_${table}_${System.nanoTime()}")
    out.write.mode(SaveMode.Overwrite).json(tmp.toString)
    FileTableOps.replace(dir, tmp, path(table))
  }

  override def tables: Seq[String] = FileTableOps.list(dir, ".jsonl")

  override def exists(table: String): Boolean = Files.exists(path(table))

  override def drop(table: String): Unit =
    if (exists(table)) FileTableOps.deleteRecursively(path(table))

  override def rename(from: String, to: String): Unit = {
    drop(to); Files.move(path(from), path(to), StandardCopyOption.ATOMIC_MOVE)
  }

  override def truncate(table: String): Unit =
    if (exists(table)) write(read(table).limit(0), table, SaveMode.Overwrite)
}
