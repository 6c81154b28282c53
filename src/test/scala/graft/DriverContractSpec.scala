package graft

import org.apache.spark.sql.types._

/** Pins the driver-harness representation contract for every
  * driver-facing frame in [[SparkEntry.queries]] (VERDICT r12 #7): the
  * driver compares Spark parquet (pyarrow → pandas) against DuckDB
  * (.df() → pandas) with a dtype-sensitive hasher and a sort_values
  * pass, so column TYPES are part of the contract, not just values.
  *
  * Unconditionally forbidden here — these broke round 12 regardless of
  * what the oracle says:
  *   - DecimalType: duckdb materializes decimal128 as objects, pyarrow
  *     as a different representation — the hash can never agree.
  *   - Array/Map/Struct: pandas sort_values throws "unhashable type"
  *     on list cells. Render as canonical strings (array_join) in the
  *     driver-facing frame; keep the typed API for library callers.
  *   - Float/Short/Byte/Binary: no oracle side ever produces them.
  *
  * IntegerType is ALLOWED — 37 queries legitimately emit int32 with
  * the oracle mirroring `CAST(… AS INTEGER)`; width agreement between
  * the two engines is cross-checked by tools/dtype_check.py (the
  * driver-hasher mirror), which a schema-only JVM spec cannot do.
  *
  * Schemas come from plan ANALYSIS on the sf0.001 tables — no query is
  * executed, but constructors that train driver-side models (BPE,
  * unigram, PQ, …) do run their bounded fits.
  */
class DriverContractSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def offending(dt: DataType): Boolean = dt match {
    case _: DecimalType | _: ArrayType | _: MapType | _: StructType => true
    case FloatType | ShortType | ByteType | BinaryType => true
    case _ => false
  }

  test("every driver-facing query schema is pandas-hasher-stable (no decimal/list/map/struct/float32)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val fields =
        try fn(spark, sf).schema.fields.toSeq
        catch { case e: Throwable =>
          fail(s"$name: query construction failed: ${e.getMessage}") }
      fields.collect { case f if offending(f.dataType) =>
        s"$name.${f.name}: ${f.dataType.simpleString}" }
    }
    assert(bad.isEmpty,
      s"driver-unstable columns (cast to BIGINT/DOUBLE or array_join to string):\n  ${bad.mkString("\n  ")}")
  }

  test("every query has an oracle, or is on the documented no-oracle floor") {
    // the xxhash64-seeded trio cannot be replayed in DuckDB (no xxhash64
    // there); each has a planted hash-green twin covering its logic
    val noOracleFloor = Set("q_dedup_minhash", "q_dedup_simhash", "q_embedding_neardup")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracleFloor
    assert(missing.isEmpty, s"queries without an oracle entry: ${missing.toSeq.sorted}")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without a query: ${orphaned.toSeq.sorted}")
  }
}
