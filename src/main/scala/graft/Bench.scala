package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // median-of-N per query (round-4 advisory: two rounds running, a
    // single-shot total mis-measured by >2× under driver-machine
    // contention — 184 s vs 75 s byte-identical; the median of 3 runs is
    // robust to a one-off stall and the reported spread shows whether a
    // number is signal or noise)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // optional comma-separated query filter for targeted re-measurement
    val only = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")  // events.ts is TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/file-footer paths so the first timed query
    // doesn't absorb session startup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    var failures = List.empty[String]
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // noop sink executes the FULL plan (a bare .count() lets Catalyst
        // drop final sorts, under-measuring order-by cost)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] FAILED $name: $e")
            e.printStackTrace()
            failures ::= name
        }
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = times.sorted
      val median = sorted(sorted.size / 2)
      System.err.println(f"[bench] $name%-24s median $median%8.2f s  " +
        f"(min ${sorted.head}%.2f  max ${sorted.last}%.2f  n=$runs)")
      name -> (median, sorted.head, sorted.last)
    }
    def fmt(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, (m, _, _)) => s"\"" + k + "\":" + fmt(m) }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, (_, lo, hi)) =>
      s"\"" + k + "\":[" + fmt(lo) + "," + fmt(hi) + "]"
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$runs,"queries":$qs,"spread":$spread,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[bench] ${failures.distinct.size} queries FAILED: ${failures.reverse.distinct.mkString(", ")}")
      sys.exit(1)
    }
  }
}
