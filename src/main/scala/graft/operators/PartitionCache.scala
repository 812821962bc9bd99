package graft.operators

import graft.functions.Exact
import graft.sources.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** O8, O11, O12: the reference's partition-cache lifecycle
  * (`server.py:95-147`, `CalcAvgLoan`): per-key materialized subsets with
  * a tri-state `source` tag —
  *   - `reuse`    — per-key partition exists, read only that (fast path,
  *                  `server.py:104-111`);
  *   - `create`   — cache miss, full scan with pushed-down key filter,
  *                  write the subset, `server.py:113-116,124-143`;
  *   - `recreate` — partition unreadable/corrupt, same fallback,
  *                  `server.py:118-121`.
  *
  * Spark-first re-expression: the cache is a `partitionBy(key)` parquet
  * directory, so the "reuse" read is a partition-pruned scan (one
  * directory listed, one column read) instead of a hand-named file. On a
  * cluster the existence probe is one NameNode RPC; reads/writes are
  * distributed. Works on any Hadoop `FileSystem` (local now, HDFS via
  * path scheme).
  */
object PartitionCache {
  private val KeyCol = "l_returnflag"
  private val ValCol = "l_extendedprice"

  /** One `CalcAvgLoan`: truncating AVG of [[ValCol]] for `key`, from the
    * per-key cache when present. Returns (avg, source-tag).
    */
  def calcAvg(spark: SparkSession, sfDir: String, cacheDir: String,
              key: String): (Long, String) = {
    val partPath = new Path(s"$cacheDir/$KeyCol=$key")
    val fs = partPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // Pinned empty-key behavior: AVG over zero rows is 0 (the reference
    // crashes here — `int(NaN)` on an unknown county, `server.py:128`;
    // we define it instead, SURVEY §7.5).
    def avgOf(df: DataFrame): Long = {
      val r = df.agg(Exact.avgFloorLong(col(ValCol))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }

    def createFrom(source: String): (Long, String) = {
      // Full-table scan with the key predicate pushed into the parquet
      // reader, then materialize the per-key subset into the cache
      // (reference: filtered read server.py:125-126, write :131-140).
      val subset = Tables.lineitem(spark, sfDir).filter(col(KeyCol) === key)
      subset.write.mode("overwrite").parquet(partPath.toString)
      (avgOf(subset), source)
    }

    if (fs.exists(partPath)) {
      try {
        // Pruned read of just this key's directory.
        (avgOf(spark.read.parquet(partPath.toString)), "reuse")
      } catch {
        case _: Exception => createFrom("recreate")
      }
    } else createFrom("create")
  }

  /** Driver-contract query: run the full create→reuse protocol for every
    * key against a fresh cache dir and emit (key, pass, avg, source) —
    * deterministically `create` on pass 1 and `reuse` on pass 2. The
    * per-key loop is control plane (it mirrors the reference's
    * one-RPC-per-county shape); each iteration's scan/agg is distributed.
    */
  def protocolTrace(spark: SparkSession, sfDir: String): DataFrame = {
    val cacheDir = graft.util.Scratch.dir("graft_cache_")
    val keys = Seq("A", "N", "R")
    val rows = for (pass <- Seq(1, 2); k <- keys) yield {
      val (avg, src) = calcAvg(spark, sfDir, cacheDir, k)
      Row(k, pass, avg, src)
    }
    val schema = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("pass", IntegerType, nullable = false),
      StructField("avg_price", LongType, nullable = false),
      StructField("source", StringType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy("key", "pass")
  }
}
