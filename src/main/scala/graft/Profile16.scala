package graft

import org.apache.spark.sql.functions._

/** r16 optimization-round measurement harness (not driver-facing):
  * phase-level timings inside the hot queries, job/stage listeners,
  * and the formulation A/Bs cited in OPTIMIZATION_r16.md (`scrubAB`,
  * `rebuildAB`, `aqe`, `jobs`, `shard`, `pr2`, `stages` arms). Kept
  * for reproducibility, like ScaleSoak; the `shard` arm replicates
  * the PRE-deferral loop structure (a historical probe, not the
  * production path — see CurateIngest.ingestShard*Deferred). */
object Profile16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.sessionBuilder(Engine.envCores(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[p16] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warmup
    spark.range(10000).groupBy(expr("id % 7")).count()
      .write.format("noop").mode("overwrite").save()
    noop(SparkEntry.queries("q_pagerank")(spark, sfDir))
    noop(SparkEntry.queries("q_curate_full")(spark, sfDir))

    val what = args.headOption.getOrElse("all")
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      if (what == "all" || what == "pagerank") {
        val orders = Tables.orders(spark, sfDir)
        val lineitem = Tables.lineitem(spark, sfDir)
        t("pr.weightedPairs (agg only)") {
          noop(graft.operators.PageRank.weightedPairs(orders, lineitem))
        }
        t("pr.full") {
          noop(graft.operators.PageRank.supplierRank(orders, lineitem))
        }
      }
      if (what == "all" || what == "curate") {
        val docs = Tables.documents(spark, sfDir)
        t("cf.spanScrubFp") {
          noop(graft.dedup.SpanScrub.spanScrubFp(docs))
        }
        t("cf.fpGramsOnly") {
          noop(graft.dedup.SpanScrub.fpGrams(
            Tables.spread(docs).select(col("doc_id"), col("text")), 40))
        }
        t("cf.curateDocsOnScrubbed") {
          val scrub = graft.dedup.SpanScrub.spanScrubFp(docs)
            .select(col("doc_id"), col("text_clean").as("text"),
              length(col("text_clean")).cast("long").as("n_chars"))
          noop(graft.text.Curate.curateDocs(scrub))
        }
        t("cf.full") {
          noop(graft.text.Curate.curateFull(docs))
        }
      }
      if (what == "all" || what == "incr") {
        val docs = Tables.documents(spark, sfDir)
        t("incr.curateFullStrict") {
          noop(graft.streaming.CurateIngest.incrCurateFullStrict(docs))
        }
      }
      if (what == "rebuildAB") {
        val docs = Tables.documents(spark, sfDir)
        val base = Tables.spread(docs).select(col("doc_id"), col("text"))
        val k = 40
        val grams = graft.dedup.SpanScrub.fpGrams(base, k)
        val wG = org.apache.spark.sql.expressions.Window
          .partitionBy(col("gram")).orderBy(col("doc_id"), col("i"))
        val cuts = grams.withColumn("rn", row_number().over(wG))
          .filter(col("rn") > 1)
          .select(col("doc_id"), col("i").as("s"), (col("i") + (k - 1)).as("e"))
          .localCheckpoint()
        def rebuildNew(base: org.apache.spark.sql.DataFrame,
                       cuts: org.apache.spark.sql.DataFrame) = {
          val merged = cuts.groupBy(col("doc_id"))
            .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("cs"))
            .select(col("doc_id"), expr(
              """aggregate(cs, cast(array() as array<struct<s:bigint,e:bigint>>),
                 (acc, x) -> if(size(acc) > 0 AND x.s <= element_at(acc, -1).e + 1,
                   concat(slice(acc, 1, size(acc) - 1),
                     array(named_struct('s', element_at(acc, -1).s,
                       'e', greatest(element_at(acc, -1).e, x.e)))),
                   concat(acc, array(named_struct('s', x.s, 'e', x.e)))))"""
            ).as("isl"))
          base.join(merged, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(size(col("isl")), lit(0)).as("n_cut_spans"),
              coalesce(expr("aggregate(isl, cast(0 as bigint), (a, x) -> a + x.e - x.s + 1)"),
                lit(0L)).as("cut_chars"),
              when(col("isl").isNull, col("text")).otherwise(expr(
                """aggregate(isl, named_struct('p', cast(0 as bigint), 't', ''),
                   (a, x) -> named_struct('p', x.e,
                     't', concat(a.t, substr(text, cast(a.p + 1 as int),
                                             cast(x.s - a.p - 1 as int)))),
                   a -> concat(a.t, substr(text, cast(a.p + 1 as int))))"""))
                .as("text_clean"))
        }
        t("rbA.current") {
          noop(graft.dedup.SpanScrub.rebuildFromCuts(base, cuts))
        }
        t("rbB.hof") { noop(rebuildNew(base, cuts)) }
        // equality check
        val aDf = graft.dedup.SpanScrub.rebuildFromCuts(base, cuts)
        val bDf = rebuildNew(base, cuts)
        val d1 = aDf.exceptAll(bDf).count()
        val d2 = bDf.exceptAll(aDf).count()
        println(s"[p16] rebuild equal: exceptA=$d1 exceptB=$d2")
      }
      if (what == "scrubAB") {
        val docs = Tables.documents(spark, sfDir)
        val base = Tables.spread(docs).select(col("doc_id"), col("text"))
        val grams = graft.dedup.SpanScrub.fpGrams(base, 40)
        val k = 40
        t("scrubA.window-cuts") {
          val wG = org.apache.spark.sql.expressions.Window
            .partitionBy(col("gram")).orderBy(col("doc_id"), col("i"))
          noop(grams.withColumn("rn", row_number().over(wG))
            .filter(col("rn") > 1)
            .select(col("doc_id"), col("i").as("s"), (col("i") + (k - 1)).as("e")))
        }
        t("scrubB.minagg-cuts") {
          val firsts = grams.groupBy(col("gram"))
            .agg(min(struct(col("doc_id"), col("i"))).as("f"))
          noop(grams.join(firsts, "gram")
            .filter(!(col("doc_id") === col("f.doc_id") && col("i") === col("f.i")))
            .select(col("doc_id"), col("i").as("s"), (col("i") + (k - 1)).as("e")))
        }
        t("scrubC.minagg-shj-cuts") {
          val firsts = grams.groupBy(col("gram"))
            .agg(min(struct(col("doc_id"), col("i"))).as("f"))
          noop(grams.hint("SHUFFLE_HASH").join(firsts, "gram")
            .filter(!(col("doc_id") === col("f.doc_id") && col("i") === col("f.i")))
            .select(col("doc_id"), col("i").as("s"), (col("i") + (k - 1)).as("e")))
        }
        t("scrubD.full-window (prod)") {
          noop(graft.dedup.SpanScrub.spanScrubFp(docs))
        }
      }
      if (what == "aqe") {
        val docs = Tables.documents(spark, sfDir)
        for (aqe <- Seq("true", "false", "true", "false")) {
          spark.conf.set("spark.sql.adaptive.enabled", aqe)
          val jobs = new java.util.concurrent.atomic.AtomicInteger
          val l = new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.incrementAndGet()
          }
          spark.sparkContext.addSparkListener(l)
          t(s"aqe=$aqe incrCurateFullStrict") {
            noop(graft.streaming.CurateIngest.incrCurateFullStrict(docs))
          }
          spark.sparkContext.removeSparkListener(l)
          println(s"[p16]   jobs=${jobs.get}")
        }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      if (what == "shard") {
        val docs = Tables.documents(spark, sfDir)
        import spark.implicits._
        import graft.streaming.CurateIngest
        var gramStore = Seq.empty[Long].toDF("gram")
        var fpStore = Seq.empty[String].toDF("fingerprint")
        var sigStore: org.apache.spark.sql.DataFrame = null
        for (i <- 0 until 4) {
          val shard = docs.filter(col("doc_id") >= i * 150L &&
            col("doc_id") < (i + 1) * 150L && col("doc_id") < 600L)
          var scrubbed0: org.apache.spark.sql.DataFrame = null
          var novel: org.apache.spark.sql.DataFrame = null
          var scrubbed: org.apache.spark.sql.DataFrame = null
          t(s"sh$i.scrubShard(marked ckpt)") {
            val r = graft.dedup.SpanScrub.scrubShard(shard, gramStore)
            scrubbed0 = r._1; novel = r._2
          }
          t(s"sh$i.scrubbed ckpt") {
            scrubbed = scrubbed0
              .select(col("doc_id"), col("text_clean").as("text"),
                length(col("text_clean")).cast("long").as("n_chars"))
              .localCheckpoint()
          }
          var gated: org.apache.spark.sql.DataFrame = null
          t(s"sh$i.gate") {
            gated = CurateIngest.gateShard(scrubbed).localCheckpoint()
          }
          var fresh: org.apache.spark.sql.DataFrame = null
          t(s"sh$i.fresh ckpt") {
            fresh = CurateIngest.freshAgainstStore(gated, fpStore).localCheckpoint()
          }
          var newBands: org.apache.spark.sql.DataFrame = null
          t(s"sh$i.sigBands ckpt") {
            newBands = CurateIngest.sigBands(fresh).localCheckpoint()
          }
          t(s"sh$i.stores") {
            import scala.concurrent.{Await, Future}
            import scala.concurrent.duration.Duration
            import scala.concurrent.ExecutionContext.Implicits.global
            val fGram = Future(gramStore.unionByName(novel).localCheckpoint())
            val fFp = Future(fpStore.unionByName(
              gated.select(col("fingerprint")).distinct()).distinct().localCheckpoint())
            val fSig = Future((if (sigStore == null) newBands
              else sigStore.unionByName(newBands)).localCheckpoint())
            gramStore = Await.result(fGram, Duration.Inf)
            fpStore = Await.result(fFp, Duration.Inf)
            sigStore = Await.result(fSig, Duration.Inf)
          }
        }
      }
      if (what == "jobs") {
        val docs = Tables.documents(spark, sfDir)
        val jobs = new java.util.concurrent.atomic.AtomicInteger
        val stages = new java.util.concurrent.atomic.AtomicInteger
        val tasks = new java.util.concurrent.atomic.AtomicInteger
        val sites = new java.util.concurrent.ConcurrentHashMap[String, Integer]
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet()
            val cs = e.stageInfos.lastOption.map(_.name.takeWhile(_ != '+'))
              .getOrElse("?")
            sites.merge(cs, 1, (a, b) => a + b)
          }
          override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stages.incrementAndGet(); tasks.addAndGet(e.stageInfo.numTasks)
          }
        }
        spark.sparkContext.addSparkListener(l)
        t("jobs.incrCurateFullStrict") {
          noop(graft.streaming.CurateIngest.incrCurateFullStrict(docs))
        }
        spark.sparkContext.removeSparkListener(l)
        println(s"[p16] jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
        import scala.jdk.CollectionConverters._
        sites.asScala.toSeq.sortBy(-_._2).foreach { case (k, v) =>
          println(s"[p16]   $v x $k") }
        val j2 = new java.util.concurrent.atomic.AtomicInteger
        val s2 = new java.util.concurrent.atomic.AtomicInteger
        val t2 = new java.util.concurrent.atomic.AtomicInteger
        val l2 = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            j2.incrementAndGet()
          override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            s2.incrementAndGet(); t2.addAndGet(e.stageInfo.numTasks)
          }
        }
        spark.sparkContext.addSparkListener(l2)
        t("jobs.incrScrub") {
          noop(graft.dedup.SpanScrub.incrScrub(docs))
        }
        spark.sparkContext.removeSparkListener(l2)
        println(s"[p16] jobs=${j2.get} stages=${s2.get} tasks=${t2.get}")
      }
      if (what == "pr2") {
        val orders = Tables.orders(spark, sfDir)
        val lineitem = Tables.lineitem(spark, sfDir)
        var pairs: org.apache.spark.sql.DataFrame = null
        t("pr2.pairs->checkpoint") {
          pairs = graft.operators.PageRank.weightedPairs(orders, lineitem)
            .localCheckpoint()
        }
        t("pr2.rankFromPairs(checkpointed)") {
          noop(graft.operators.PageRank.rankFromPairs(pairs))
        }
        t("pr2.full-supplierRank") {
          noop(graft.operators.PageRank.supplierRank(orders, lineitem))
        }
      }
      if (what == "stages") {
        val docs = Tables.documents(spark, sfDir)
        // replicate curateDocs internals stage by stage
        val scrub = graft.dedup.SpanScrub.spanScrubFp(docs)
          .select(col("doc_id"), col("text_clean").as("text"),
            length(col("text_clean")).cast("long").as("n_chars"))
        var exact: org.apache.spark.sql.DataFrame = null
        t("st.scrub+gate+md5->checkpoint") {
          val scored = Tables.spread(scrub)
            .withColumn("quality_pm", graft.text.TextAnalysis.qualityExpr)
            .withColumn("lang_pred", graft.text.TextAnalysis.langPred)
          val gated = scored.filter(col("quality_pm") >= 600 &&
            col("lang_pred").isin("en", "de"))
          val wMd5 = org.apache.spark.sql.expressions.Window
            .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
          exact = gated.withColumn("__rn", row_number().over(wMd5))
            .filter(col("__rn") === 1).drop("__rn").localCheckpoint()
        }
        t("st.dropsBest(exact)") {
          noop(graft.dedup.Clusters.dropsBest(exact))
        }
        t("st.minhashCandidates(exact)") {
          noop(graft.dedup.Dedup.minhashCandidates(exact, 4, 0.5))
        }
        var kept: org.apache.spark.sql.DataFrame = null
        t("st.kept(anti-join)") {
          kept = exact.join(graft.dedup.Clusters.dropsBest(exact),
            Seq("doc_id"), "left_anti").localCheckpoint()
        }
        t("st.contamination-tail") {
          val bench = graft.dedup.Dedup.shingles(
              docs.filter(col("doc_id") < 20), 8)
            .select(col("sh")).distinct()
          val contaminated = graft.dedup.Dedup.shingles(kept, 8)
            .filter(col("doc_id") >= 20)
            .join(broadcast(bench.withColumn("__hit", lit(1))), Seq("sh"), "left")
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_tot"), count(col("__hit")).as("n_shared"))
            .filter(col("n_shared") * lit(1000L) >= col("n_tot") * lit(800L))
            .select("doc_id")
          noop(kept.join(contaminated, Seq("doc_id"), "left_anti"))
        }
      }
    }
    spark.stop()
  }
}
