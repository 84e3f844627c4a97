package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The reference type table's TIME row, closed at BOTH tiers (round 18):
 *
 *  - TIME(MILLIS)/INT32 (`reader_writer.h:41-42` verbatim): Spark's
 *    parquet reader rejects it outright (PARQUET_TYPE_ILLEGAL) — the
 *    TOOLS tier carries it (TimeMillisSpec: raw schema dump + int-millis
 *    value round-trip), pinned here so a future Spark that starts
 *    reading it gets noticed;
 *  - TIME(MICROS)/INT64, unadjusted: FIRST-CLASS behind Spark 4.1's
 *    `spark.sql.timeType.enabled` — reads as `TimeType(6)`, round-trips
 *    through a Spark write, and drives SQL time functions. A user
 *    migrating TIME data lands here; only the reference's exact
 *    MILLIS/INT32 physical shape needs the tools path.
 */
class TimeTypeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeTimeFile(unit: org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit,
      phys: org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName,
      path: String): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val schema = Types.buildMessage()
      .optional(phys).as(LogicalTypeAnnotation.timeType(false, unit)).named("t")
      .named("m")
    val w = ExampleParquetWriter.builder(new org.apache.hadoop.fs.Path(path))
      .withConf(spark.sparkContext.hadoopConfiguration).withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    val g = f.newGroup()
    if (phys == PrimitiveTypeName.INT32) g.append("t", 34200123)
    else g.append("t", 34200123456L) // 09:30:00.123456 as µs-of-day
    try w.write(g) finally w.close()
  }

  test("TIME(MICROS) is first-class behind spark.sql.timeType.enabled") {
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val base = java.nio.file.Files.createTempDirectory("graft-timetype").toString
    writeTimeFile(TimeUnit.MICROS, PrimitiveTypeName.INT64, s"$base/us.parquet")
    val prev = spark.conf.getOption("spark.sql.timeType.enabled")
    spark.conf.set("spark.sql.timeType.enabled", "true")
    try {
      val df = spark.read.parquet(s"$base/us.parquet")
      assert(df.schema.head.dataType.toString == "TimeType(6)",
        s"expected TimeType(6), got ${df.schema}")
      assert(df.selectExpr("CAST(t AS STRING)").head.getString(0)
        == "09:30:00.123456")
      // Spark write → read round-trip, and SQL functions drive it
      df.write.parquet(s"$base/rt.parquet")
      val rt = spark.read.parquet(s"$base/rt.parquet")
      assert(rt.schema.head.dataType.toString == "TimeType(6)")
      assert(rt.selectExpr("HOUR(t)", "MINUTE(t)").head.toSeq == Seq(9, 30))
      // the written file carries the annotation for foreign readers
      val raw = graft.sources.Tools.parquetSchemaTree(spark,
        graft.sources.Tools.parquetFiles(spark, s"$base/rt.parquet").head.toString)
      assert(raw.contains("TIME(MICROS,false)"), raw)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.timeType.enabled", v)
        case None => spark.conf.unset("spark.sql.timeType.enabled")
      }
    }
  }

  test("TIME(MILLIS)/INT32 stays a tools-tier type (reader rejects it, pinned)") {
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val base = java.nio.file.Files.createTempDirectory("graft-timetype2").toString
    writeTimeFile(TimeUnit.MILLIS, PrimitiveTypeName.INT32, s"$base/ms.parquet")
    val prev = spark.conf.getOption("spark.sql.timeType.enabled")
    spark.conf.set("spark.sql.timeType.enabled", "true")
    try {
      val ex = intercept[Exception] {
        spark.read.parquet(s"$base/ms.parquet").collect()
      }
      assert(ex.getMessage.contains("PARQUET_TYPE_ILLEGAL"),
        s"if this stopped failing, promote MILLIS off the tools tier: $ex")
      // the tools tier reads it regardless (TimeMillisSpec has the full gate)
      val vl = graft.sources.Tools.valueLevels(spark, s"$base/ms.parquet")
      assert(vl.map(_.value) == Seq("34200123"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.timeType.enabled", v)
        case None => spark.conf.unset("spark.sql.timeType.enabled")
      }
    }
  }
}
