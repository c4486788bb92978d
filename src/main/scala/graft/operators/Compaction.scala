package graft.operators

import org.apache.spark.sql.DataFrame

/** Small-file compaction — the table-maintenance pass every long-running
  * ingest needs: streaming micro-batches and per-partition appends leave
  * thousands of KB-sized parquet files, and at 100 TB the scan's task
  * count (and the namenode/listing load) is proportional to FILE COUNT,
  * not data size. Compaction rewrites a directory into
  * ceil(bytes / targetBytes) files of roughly even size.
  *
  * The file count comes from the SOURCE's actual on-disk size (summed
  * from the files the scan enumerates — no Catalyst stats dependency,
  * correct for any layout), and the rewrite is one round-robin
  * `repartition(n)`: no range shuffle, no sort — compaction must not
  * silently claim to preserve a clustering it doesn't know about; keep
  * order with [[ZOrder.writeZOrdered]] or a repartitionByRange rewrite
  * when the layout matters.
  */
object Compaction {

  /** Bytes currently on disk under the frame's input files. */
  def inputBytes(df: DataFrame): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
  }

  /** Target output file count for a rewrite at `targetBytes` per file
    * (parquet re-encodes, so on-disk size is ~preserved; a compression
    * `ratio` adjusts when re-encoding is expected to shrink/grow). */
  def planFileCount(df: DataFrame, targetBytes: Long, ratio: Double = 1.0): Int = {
    require(targetBytes > 0)
    val bytes = (inputBytes(df) * ratio).toLong
    math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
  }

  /** Rewrite `path` into ~targetBytes files. Returns the file count. */
  def compact(df: DataFrame, outPath: String, targetBytes: Long): Int = {
    val n = planFileCount(df, targetBytes)
    df.repartition(n).write.mode("overwrite").parquet(outPath)
    n
  }
}
