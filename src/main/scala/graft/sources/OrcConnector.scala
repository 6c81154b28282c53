package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Path-addressed ORC "database": each table is `<dir>/<name>.orc`.
  * The [[ParquetConnector]]'s sibling for shops whose lake standard is
  * ORC (Hive-lineage warehouses) — same transport contract as the
  * reference's MySQL transport (`lib/forklift/transports/mysql.rb`),
  * same atomic tmp-dir + rename publish
  * (`patterns/mysql_patterns.rb:28-43`) so readers never observe
  * partial state.
  *
  * Spark's ORC support is built in (native vectorized reader), so the
  * connector is pure orchestration: no timestamp-shape normalization
  * is needed here because ORC's logical timestamp type has a single
  * Spark surface — the parquet NANOS/NTZ ambiguity this connector's
  * sibling handles does not exist for ORC tables we read or write.
  *
  * Scale: ORC dirs are file-additive like parquet dirs, so Append with
  * a conforming schema moves O(delta) new files in per-file atomic
  * renames (never a table rewrite); only genuine schema evolution pays
  * the union-rewrite. Predicate pushdown and column pruning reach the
  * ORC scan exactly as they do for parquet (OrcConnectorSpec pins
  * both on the physical plan).
  */
class OrcConnector(val spark: SparkSession, protected val dir: String) extends Connector {
  Files.createDirectories(Paths.get(dir))

  protected def path(table: String): Path = Paths.get(dir, table + ".orc")

  override def read(table: String): DataFrame = spark.read.orc(path(table).toString)

  override def tables: Seq[String] = FileTableOps.list(dir, ".orc")

  override def exists(table: String): Boolean = Files.exists(path(table))

  override def write(df: DataFrame, table: String, mode: SaveMode = SaveMode.Overwrite): Unit = mode match {
    case SaveMode.Append if exists(table) =>
      val existing = read(table).schema
      if (!SchemaInfer.evolves(existing, df.schema))
        additiveAppend(SchemaInfer.evolve(df, existing), table)
      else {
        val merged = SchemaInfer.merge(existing, df.schema)
        val out = SchemaInfer.evolve(read(table), merged)
          .unionByName(SchemaInfer.evolve(df, merged))
        atomicWrite(out, table)
      }
    case _ => atomicWrite(df, table)
  }

  private def additiveAppend(df: DataFrame, table: String): Unit = {
    val tmp = Paths.get(dir, s".tmp_${table}_${System.nanoTime()}")
    df.write.mode(SaveMode.Overwrite).orc(tmp.toString)
    val dst = path(table)
    val s = Files.list(tmp)
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val f = it.next()
        val n = f.getFileName.toString
        // only data files; spark part-file names carry a UUID so they
        // cannot collide with existing files in the table dir
        if (n.endsWith(".orc") && !n.startsWith(".") && !n.startsWith("_"))
          Files.move(f, dst.resolve(n), StandardCopyOption.ATOMIC_MOVE)
      }
    } finally s.close()
    FileTableOps.deleteRecursively(tmp)
  }

  protected def atomicWrite(df: DataFrame, table: String): Unit = {
    // NullType (the varchar(0) sentinel) is unwritable in ORC too —
    // promote to tagged string at the storage edge so it stays promotable
    val out = if (df.schema.fields.exists(_.dataType == org.apache.spark.sql.types.NullType))
      SchemaInfer.evolve(df, df.schema) else df
    val tmp = Paths.get(dir, s".tmp_${table}_${System.nanoTime()}")
    out.write.mode(SaveMode.Overwrite).orc(tmp.toString)
    FileTableOps.replace(dir, tmp, path(table))
  }

  override def drop(table: String): Unit =
    if (exists(table)) FileTableOps.deleteRecursively(path(table))

  override def rename(from: String, to: String): Unit = {
    drop(to)
    Files.move(path(from), path(to), StandardCopyOption.ATOMIC_MOVE)
  }

  override def truncate(table: String): Unit =
    if (exists(table)) atomicWrite(read(table).limit(0), table)
}
