package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Upserting, schema-evolving writer — the Spark re-expression of the
  * reference's MySQL `write` (taskrabbit/forklift
  * `lib/forklift/transports/mysql.rb:55-103`):
  *
  *  1. lazy create on first write (`lazy_table_create`, `mysql.rb:105-132`)
  *  2. schema evolution: unseen columns added (`mysql.rb:64-73`), all-null
  *     sentinel columns promoted on first value (`mysql.rb:258-279`)
  *  3. upsert = DELETE-by-pk then INSERT. The reference collects pks,
  *     issues one `DELETE … WHERE pk IN (…)`, then a multi-row INSERT —
  *     and notably does NOT dedup within a batch: duplicate pks in the
  *     incoming batch ALL survive insertion (`mysql.rb:78-87`). We encode
  *     that quirk exactly: anti-join out matching targets, then append the
  *     whole incoming batch.
  *
  * Scale: the delete-targeting pk list never crosses the driver — it is a
  * distributed LEFT ANTI join on the key. Catalyst/AQE broadcast the
  * incoming-batch key side when it is small (the common case: a batch
  * against a huge target), so the big side streams without a shuffle; for
  * batch ~ target sized merges AQE falls back to a shuffled hash join.
  * The rewrite-then-atomic-swap publish is inherited from the connector.
  */
object UpsertWriter {

  def upsert(conn: Connector, incoming: DataFrame, table: String, primaryKey: String = "id"): Unit = {
    if (!conn.exists(table)) {
      // lazy_table_create parity: first write defines the schema.
      conn.write(incoming, table, SaveMode.Overwrite)
      return
    }
    val target = conn.read(table)
    val merged = SchemaInfer.merge(target.schema, incoming.schema)
    val t = SchemaInfer.evolve(target, merged)
    val u = SchemaInfer.evolve(incoming, merged)
    val result =
      if (!u.columns.contains(primaryKey)) t.unionByName(u) // no pk → plain insert (mysql.rb:78 guard)
      else mergeByKey(t, u, primaryKey)
    conn.write(result, table, SaveMode.Overwrite)
  }

  /** Pure merge used by upsert and by [[graft.operators.Patterns]]:
    * `target ⟕anti updates.pk ∪ updates` — delete-then-insert semantics
    * as a declarative plan Catalyst can optimize. */
  def mergeByKey(target: DataFrame, updates: DataFrame, primaryKey: String): DataFrame = {
    val keys = updates.select(col(primaryKey)).distinct()
    target.join(keys, Seq(primaryKey), "left_anti").unionByName(updates)
  }

}
