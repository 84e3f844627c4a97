package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/**
 * Metadata / introspection parity (SURVEY.md §2.9, M1–M5) — the Spark
 * re-expression of the reference's CLI tools:
 *  - schema tree dump     (`cpp/tools/parquet/parquet-dump-schema.cc:26-33`)
 *  - metadata+value dump  (`cpp/tools/parquet/parquet_reader.cc:63-72`)
 *  - JSON dump            (`parquet_reader.cc:50-51,67-69`)
 *  - key-value metadata   (`parquet_reader.cc:46-47,70-71`)
 *  - timed projected scan (`cpp/tools/parquet/parquet-scan.cc:60-71`)
 *
 * Footer-level facts (row groups, per-chunk stats, KV metadata) come from
 * parquet-mr on the driver — footers only, never data pages, mirroring the
 * reference's `--only-metadata` fast path (`parquet_reader.cc:44-45`).
 */
object Tools {

  /** M1: schema tree, Spark's `treeString` ~ the reference's `PrintSchema`. */
  def schemaTree(spark: SparkSession, path: String): String =
    spark.read.parquet(path).schema.treeString

  /** M3: schema as JSON (the `--json` analogue for schema). */
  def schemaJson(spark: SparkSession, path: String): String =
    spark.read.parquet(path).schema.json

  final case class RowGroupInfo(
      file: String,
      rowGroup: Int,
      numRows: Long,
      totalByteSize: Long,
      compressedBytes: Long,
      numColumns: Int)

  final case class ColumnChunkInfo(
      file: String,
      rowGroup: Int,
      column: String,
      physicalType: String,
      codec: String,
      numValues: Long,
      compressedBytes: Long,
      uncompressedBytes: Long,
      nullCount: Long,
      minValue: String,
      maxValue: String)

  private[graft] def parquetFiles(spark: SparkSession, path: String): Seq[Path] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs: FileSystem = p.getFileSystem(conf)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).toSeq.map(_.getPath)
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    else Seq(p)
  }

  /** M2/M5: per-row-group footer metadata (the `num_row_groups()/num_rows` surface,
    * `reader-writer.cc:185-193`, and the row-group size invariant `reader-writer2.cc:222`). */
  def rowGroups(spark: SparkSession, path: String): Seq[RowGroupInfo] = {
    val conf = spark.sparkContext.hadoopConfiguration
    parquetFiles(spark, path).flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map { case (b, i) =>
          RowGroupInfo(f.toString, i, b.getRowCount, b.getTotalByteSize,
            b.getCompressedSize, b.getColumns.size())
        }
      } finally reader.close()
    }
  }

  /** M2: per-column-chunk stats (types, codec, null counts, min/max). */
  def columnChunks(spark: SparkSession, path: String): Seq[ColumnChunkInfo] = {
    val conf = spark.sparkContext.hadoopConfiguration
    parquetFiles(spark, path).flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap { case (b, i) =>
          b.getColumns.asScala.toSeq.map { c =>
            val st = c.getStatistics
            ColumnChunkInfo(
              f.toString, i, c.getPath.toDotString, c.getPrimitiveType.getPrimitiveTypeName.name,
              c.getCodec.name, c.getValueCount, c.getTotalSize, c.getTotalUncompressedSize,
              if (st != null && st.isNumNullsSet) st.getNumNulls else -1L,
              if (st != null && st.hasNonNullValue) String.valueOf(st.genericGetMin) else "",
              if (st != null && st.hasNonNullValue) String.valueOf(st.genericGetMax) else "")
          }
        }
      } finally reader.close()
    }
  }

  /** M4 (read side): file key-value (user) metadata from the footer. */
  def keyValueMetadata(spark: SparkSession, path: String): Map[String, String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    parquetFiles(spark, path).headOption.map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try reader.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
      finally reader.close()
    }.getOrElse(Map.empty)
  }

  /**
   * M4 (write side): attach user key-value metadata to a parquet file.
   * Spark's DataFrame writer exposes no footer-KV hook, so this goes one
   * level down to parquet-mr (the same library Spark writes with): row
   * groups are byte-copied via `ParquetFileWriter.appendFile` — no decode,
   * no re-encode, footer-only work, mirroring the reference's low-level
   * writer setting `key_value_metadata` at file close
   * (`cpp/examples/parquet/low-level-api/reader-writer.cc` builder setup).
   * Existing KV entries (including Spark's schema key) are preserved;
   * `extra` wins on conflict. Driver-side by design: it is a per-FILE
   * footer tool like the rest of [[Tools]], not a distributed operator.
   */
  def writeKeyValueMetadata(spark: SparkSession, srcFile: String, dstFile: String,
      extra: Map[String, String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = HadoopInputFile.fromPath(new Path(srcFile), conf)
    val reader = ParquetFileReader.open(in)
    val (schema, existingKv) =
      try (reader.getFooter.getFileMetaData.getSchema,
        reader.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap)
      finally reader.close()
    val writer = new ParquetFileWriter(
      HadoopOutputFile.fromPath(new Path(dstFile), conf), schema,
      ParquetFileWriter.Mode.OVERWRITE,
      128L * 1024 * 1024 /* row-group bytes — unused for byte-copied groups */,
      8 * 1024 * 1024 /* max padding */)
    writer.start()
    writer.appendFile(in)
    writer.end((existingKv ++ extra).asJava)
  }

  /** Metadata DataFrames, so introspection itself is queryable. */
  def rowGroupsDf(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    rowGroups(spark, path).toDF()
  }

  def columnChunksDf(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    columnChunks(spark, path).toDF()
  }

  /** P2+A1: the `parquet-scan` tool — timed, column-projected full scan
    * returning (rows, seconds). Column pruning reaches the parquet reader
    * via Catalyst; batch size is the vectorized reader's
    * `columnarReaderBatchSize` (the `--batch-size` analogue). */
  def timedScan(spark: SparkSession, path: String, columns: Seq[String] = Nil): (Long, Double) = {
    val df0 = spark.read.parquet(path)
    val df = if (columns.nonEmpty) df0.select(columns.map(org.apache.spark.sql.functions.col): _*) else df0
    val t0 = System.nanoTime()
    val n = df.count()
    (n, (System.nanoTime() - t0) / 1e9)
  }
}
