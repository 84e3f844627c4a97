package graft

/**
 * Round-14 measurement behind the SCALE.md claim for
 * [[graft.sources.Fs.countFilesDistributed]]: the fragmented-partition
 * listing wall at ≥10⁴ partitions, sequential driver loop vs one
 * distributed pass. Synthesizes `nDirs` partition directories × `nFiles`
 * empty `.parquet`-named files (the listing only reads names, so empty
 * files measure exactly the RPC/syscall term) and times both paths.
 *
 * Local-FS numbers UNDERSTATE the win: a local listStatus is a ~µs
 * syscall, while an object-store LIST is a ~10–100 ms round-trip — the
 * sequential loop scales with nDirs·RTT, the distributed pass with
 * (nDirs/tasks)·RTT. The measured local ratio is therefore a floor.
 */
object ProfileListing {
  def run(args: Array[String]): Unit = {
    val nDirs = args.headOption.map(_.toInt).getOrElse(10000)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-listing")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val base = java.nio.file.Files.createTempDirectory("graft-listing")
    println(s"[listing] synthesizing $nDirs dirs x $nFiles files under $base")
    val dirs = (0 until nDirs).map { i =>
      val d = base.resolve(f"pc=$i%06d")
      java.nio.file.Files.createDirectory(d)
      (0 until nFiles).foreach(j =>
        java.nio.file.Files.createFile(d.resolve(s"part-$j.parquet")))
      d.toString
    }
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[listing] $tag%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm both code paths once on a slice so JIT/classloading is out
    graft.sources.Fs.countFilesDistributed(spark, dirs.take(64), ".parquet", driverLoopBelow = 0)
    graft.sources.Fs.countFilesDistributed(spark, dirs.take(64), ".parquet", driverLoopBelow = 1 << 30)
    val seq = time("driver loop")(
      graft.sources.Fs.countFilesDistributed(spark, dirs, ".parquet",
        driverLoopBelow = Int.MaxValue))
    val dist = time("distributed")(
      graft.sources.Fs.countFilesDistributed(spark, dirs, ".parquet",
        driverLoopBelow = 0))
    require(seq == dist, "paths disagree")
    require(seq.values.sum == nDirs.toLong * nFiles)
    println(s"[listing] counts agree: ${seq.size} dirs, ${seq.values.sum} files")
    // best-effort cleanup (driver-local scratch)
    dirs.foreach { d =>
      val p = java.nio.file.Paths.get(d)
      (0 until nFiles).foreach(j => java.nio.file.Files.deleteIfExists(p.resolve(s"part-$j.parquet")))
      java.nio.file.Files.deleteIfExists(p)
    }
    java.nio.file.Files.deleteIfExists(base)
    spark.stop()
  }
}
