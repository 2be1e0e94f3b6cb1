package graft

import graft.ops.Multimodal
import graft.streaming.StreamSessionize
import graft.streaming.StreamSessionize.{SessionEvent, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A fake "real codec" for the decoder-injection spec: fixed dimensions,
  * format derived from payload length. Top-level (not an inner object) so
  * task serialization ships only the decoder, never the spec class; each
  * task's deserialized copy starts un-opened, so the decode-side check
  * proves open() ran on THAT copy before any decode.
  */
class FixedTestDecoder extends Multimodal.AssetDecoder {
  @volatile private var opened = false
  override def open(): Unit = { opened = true }
  def decode(payload: Array[Byte], kind: String): (Int, Int, String) = {
    if (!opened) throw new IllegalStateException("open() must run before decode()")
    (320, 200, s"len${payload.length % 10}")
  }
}

class StreamingMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming sessionization closes sessions when watermark passes gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = StreamSessionize.sessions(input.toDS(), gapUs = 60000000L, // 1 min gap
      delayThreshold = "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .start()

    // base offset > 0: an event at exactly epoch 0 equals the initial
    // watermark and is discarded as late data
    def us(min: Long) = (min + 60) * 60000000L
    // user 1: two events 10s apart (one session), then silence
    input.addData(
      SessionEvent(1L, us(0), 1), SessionEvent(1L, us(0) + 10000000L, 2))
    q.processAllAvailable()
    // advance event time far past the gap → user 1's session must close
    input.addData(SessionEvent(2L, us(10), 3))
    q.processAllAvailable()
    input.addData(SessionEvent(2L, us(30), 4)) // closes user 2's first session too
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions_out").as[SessionOut].collect()
      .sortBy(s => (s.user_id, s.session_start_us))
    info("emitted: " + sessions.mkString("; "))
    assert(sessions.exists(s => s.user_id == 1 && s.n_events == 2 &&
      s.session_end_us - s.session_start_us == 10000000L))
    assert(sessions.exists(s => s.user_id == 2 && s.n_events == 1))
  }

  test("late within-watermark events form separate earlier sessions, not merges") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = StreamSessionize.sessions(input.toDS(), gapUs = 60000000L, // 1 min gap
      delayThreshold = "2 hours")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    def us(min: Long) = (min + 600) * 60000000L
    input.addData(SessionEvent(9L, us(60), 1))
    q.processAllAvailable()
    // late event 30 min EARLIER — within the 2h watermark delay; the real
    // gap (30 min) exceeds the 1 min session gap → must NOT merge
    input.addData(SessionEvent(9L, us(30), 2))
    q.processAllAvailable()
    // push event time far ahead so the watermark closes both sessions
    input.addData(SessionEvent(8L, us(600), 3))
    q.processAllAvailable()
    input.addData(SessionEvent(8L, us(1200), 4))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("late_out").as[SessionOut].collect()
      .filter(_.user_id == 9).sortBy(_.session_start_us)
    assert(sessions.length == 2, s"got: ${sessions.mkString(";")}")
    assert(sessions(0).session_start_us == us(30) && sessions(0).n_events == 1)
    assert(sessions(1).session_start_us == us(60) && sessions(1).n_events == 1)
  }

  test("streaming windowed stats over memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val df = input.toDS().toDF("ts_us", "event_type", "value")
    val out = StreamSessionize.windowedStats(df, "ts_us", "event_type", "value",
      "1 hour", "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .start()
    input.addData((0L, "click", 1.0), (1000000L, "click", 2.0), (3599000000L, "buy", 5.0))
    q.processAllAvailable()
    input.addData((7200000000L, "click", 1.0)) // advances watermark, closes hour 0
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out")
      .select(col("event_type"), col("n"), col("sum_value")).collect()
    assert(rows.exists(r => r.getString(0) == "click" && r.getLong(1) == 2 &&
      r.getDouble(2) == 3.0))
    assert(rows.exists(r => r.getString(0) == "buy" && r.getLong(1) == 1))
  }

  test("sliding windows aggregate identically on stream and batch") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq( // 30-min slide, 1-h window: each event in 2 windows
      (600000000L, "click", 1.0), // 00:10 -> windows 23:40? no: starts 00:00, -00:30
      (2400000000L, "click", 2.0), // 00:40
      (4200000000L, "buy", 5.0)) // 01:10
    // streaming append-mode must group on the window STRUCT over the
    // WATERMARKED timestamp column; deriving window_start_us after the
    // agg keeps batch and stream outputs identical
    def agg(d: org.apache.spark.sql.DataFrame) = graft.ops.Sessionize
      .sliding(d, "ts", windowUs = 3600000000L, slideUs = 1800000000L)
      .groupBy(col("window"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))
    val batch = agg(events.toDF("ts_us", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("ts_us"))))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val input = MemoryStream[(Long, String, Double)]
    val streamDf = input.toDS().toDF("ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
    val out = agg(streamDf)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("slide_out").start()
    events.foreach { e => input.addData(e); q.processAllAvailable() }
    // sentinel far in the future closes every window
    input.addData((86400000000L * 10, "click", 0.0)); q.processAllAvailable()
    input.addData((86400000000L * 10 + 1, "click", 0.0)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("slide_out")
      .select(col("window_start_us"), col("event_type"), col("n"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .filter { case ((ws, _), _) => ws < 86400000000L } // drop sentinel windows
      .toMap
    assert(streamed == batch)
    // each of the 3 events produced exactly 2 window memberships
    assert(batch.values.map(_._1).sum == 6L)
  }

  test("incremental streaming CC equals batch CC after every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scc").toString
    val input = MemoryStream[(String, String)]
    val q = graft.streaming.StreamComponents.run(
      input.toDF().toDF("src", "dst"), s"$dir/state", s"$dir/ckpt")
    // three batches that first build separate components, then merge them
    val batches = Seq(
      Seq(("a", "b"), ("c", "d")),
      Seq(("e", "f"), ("b", "a")),          // duplicate edge, reversed
      Seq(("d", "e"), ("x", "y")))          // merges c-d with e-f
    var seen = Seq.empty[(String, String)]
    batches.foreach { b =>
      input.addData(b: _*)
      q.processAllAvailable()
      seen ++= b
      val streamed = graft.streaming.StreamComponents
        .currentState(spark, s"$dir/state").get
        .as[(String, String)].collect().toSet
      val batchCc = graft.ops.ConnectedComponents
        .components(seen.toDF("src", "dst"))
        .as[(String, String)].collect().toSet
      assert(streamed == batchCc, s"after batch $b")
    }
    q.stop()
    // final state: {a,b}, {c,d,e,f}, {x,y}
    val fin = graft.streaming.StreamComponents.currentState(spark, s"$dir/state")
      .get.as[(String, String)].collect().toMap
    assert(fin("f") == "c" && fin("d") == "c" && fin("b") == "a" && fin("y") == "x")
  }

  test("streaming CC at depth: 24 batches, state stays O(V), labels exact") {
    // guards the spanning-forest invariant over a LONG stream: state row
    // count must equal the number of distinct nodes ever seen (one forest
    // edge per node — never O(edges)), and labels must equal batch CC
    // after every one of 24 batches with interleaved cross-component merges
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scc-deep").toString
    val input = MemoryStream[(String, String)]
    val q = graft.streaming.StreamComponents.run(
      input.toDF().toDF("src", "dst"), s"$dir/state", s"$dir/ckpt")
    def batchEdges(i: Int): Seq[(String, String)] = {
      val grow = Seq((f"v${2 * i}%02d", f"v${2 * i + 1}%02d"))
      val link = if (i % 2 == 1) Seq((f"v${2 * (i - 1)}%02d", f"v${2 * i}%02d")) else Nil
      val far = if (i % 5 == 4) Seq((f"v${2 * (i - 4)}%02d", f"v${2 * i + 1}%02d")) else Nil
      val dup = if (i % 3 == 2) Seq((f"v${2 * i + 1}%02d", f"v${2 * i}%02d")) else Nil
      grow ++ link ++ far ++ dup
    }
    var seen = Seq.empty[(String, String)]
    (0 until 24).foreach { i =>
      val b = batchEdges(i)
      input.addData(b: _*)
      q.processAllAvailable()
      seen ++= b
      val state = graft.streaming.StreamComponents
        .currentState(spark, s"$dir/state").get
        .as[(String, String)].collect()
      val nodesSeen = seen.flatMap(e => Seq(e._1, e._2)).toSet
      assert(state.length == nodesSeen.size,
        s"batch $i: state ${state.length} rows != |V| ${nodesSeen.size}")
      val batchCc = graft.ops.ConnectedComponents
        .components(seen.toDF("src", "dst"))
        .as[(String, String)].collect().toSet
      assert(state.toSet == batchCc, s"labels diverged at batch $i")
    }
    q.stop()
  }

  test("streaming CC keeps singleton components across merges") {
    // a self-loop node is its own component; a later unrelated batch must
    // not evict it from state (ADVICE r2: only node=!=component forest
    // edges were carried forward, so self-rooted singletons vanished)
    val dir = java.nio.file.Files.createTempDirectory("graft-scc-single").toString
    val sc = graft.streaming.StreamComponents
    sc.mergeBatch(Seq(("s", "s"), ("a", "b")).toDF("src", "dst"), s"$dir/state")
    sc.mergeBatch(Seq(("p", "q")).toDF("src", "dst"), s"$dir/state")
    val st = sc.currentState(spark, s"$dir/state").get
      .as[(String, String)].collect().toMap
    assert(st("s") == "s", s"singleton lost: $st")
    assert(st("b") == "a" && st("q") == "p")
  }

  test("streaming CC state survives a crash between rotate and promote") {
    // simulate the worst crash window: current is gone, only prev remains.
    // currentState must fall back to prev, and re-merging the interrupted
    // batch (what checkpoint replay does) must converge to the same state.
    val dir = java.nio.file.Files.createTempDirectory("graft-scc-crash").toString
    val sc = graft.streaming.StreamComponents
    sc.mergeBatch(Seq(("a", "b")).toDF("src", "dst"), s"$dir/state")
    sc.mergeBatch(Seq(("b", "c")).toDF("src", "dst"), s"$dir/state") // leaves prev + current
    val fs = new org.apache.hadoop.fs.Path(s"$dir/state")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash: promote never happened — current lost, prev (batch-1 state) intact
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/state/current"), true))
    val recovered = sc.currentState(spark, s"$dir/state").get
      .as[(String, String)].collect().toMap
    assert(recovered == Map("a" -> "a", "b" -> "a")) // batch-1 state
    // checkpoint replays batch 2
    sc.mergeBatch(Seq(("b", "c")).toDF("src", "dst"), s"$dir/state")
    val st = sc.currentState(spark, s"$dir/state").get
      .as[(String, String)].collect().toMap
    assert(st == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("streaming sessionization matches batch sessionizer on sf0.001 events") {
    implicit val sqlCtx = spark.sqlContext
    // Tables.events derives ts_us schema-adaptively (encoding has drifted)
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .as[(Long, Long, Long)].collect()
      .map { case (u, t, e) => SessionEvent(u, t, e) }
      .sortBy(e => (e.ts_us, e.event_id))
    val gap = 1800000000L // 30 min, same as q_sessionize

    val input = MemoryStream[SessionEvent]
    val out = StreamSessionize.sessions(input.toDS(), gap, "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("equiv_out").start()
    // feed in two chunks, then a far-future sentinel to flush every session
    val (a, b) = events.splitAt(events.length / 2)
    input.addData(a.toIndexedSeq); q.processAllAvailable()
    input.addData(b.toIndexedSeq); q.processAllAvailable()
    val sentinel = SessionEvent(-1L, events.last.ts_us + 365L * 86400000000L, 0)
    input.addData(sentinel); q.processAllAvailable()
    input.addData(sentinel.copy(event_id = 1)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("equiv_out").as[SessionOut].collect()
      .filter(_.user_id >= 0)
      .groupBy(_.user_id).view.mapValues(_.length).toMap
    val batch = graft.ops.Sessionize.sessionStats(
        graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
          .select(col("user_id"), col("ts_us"), col("event_id")),
        "user_id", "ts_us", "event_id", gap)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (u, n) =>
      assert(n.toLong == batch(u), s"user $u: streamed $n vs batch ${batch(u)}")
    }
  }

  test("multimodal: pack → decode → features pipeline, deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val assets = Multimodal.decodeAssets(Multimodal.packAssets(docs, "doc_id", "text"))
    assert(assets.schema == Multimodal.assetSchema)
    val metas = assets.select("asset_id", "meta.width", "meta.height", "meta.format")
      .as[(Long, Int, Int, String)].collect()
    assert(metas.length == 50)
    assert(metas.forall { case (_, w, h, _) => w >= 64 && h >= 64 })
    // deterministic across runs
    val again = Multimodal.decodeAssets(Multimodal.packAssets(docs, "doc_id", "text"))
      .select("asset_id", "meta.width").as[(Long, Int)].collect().toMap
    assert(metas.forall { case (id, w, _, _) => again(id) == w })
    // features: fixed dim, deterministic, partition-count preserved
    val feats = Multimodal.extractFeatures(assets, dim = 8)
    assert(feats.select(size(col("features"))).as[Int].collect().forall(_ == 8))
    // frame sampling emits n rows per video asset
    val frames = Multimodal.sampleFrames(assets, n = 4)
    val videos = assets.where(col("kind") === "video").count()
    assert(frames.count() == videos * 4)
  }

  test("multimodal: a custom AssetDecoder injects through decodeAssets") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val packed = Multimodal.packAssets(docs, "doc_id", "text")
    val got = Multimodal.decodeAssets(packed, new FixedTestDecoder)
    assert(got.schema == Multimodal.assetSchema) // schema contract survives
    val metas = got.select("meta.width", "meta.height", "meta.format")
      .as[(Int, Int, String)].collect()
    assert(metas.length == 20)
    assert(metas.forall { case (w, h, f) => w == 320 && h == 200 && f.startsWith("len") })
    // default decoder unchanged: same inputs still give the stub's metadata
    val stub = Multimodal.decodeAssets(packed)
      .select("meta.width").as[Int].collect()
    assert(stub.forall(_ >= 64))
  }

  test("ImageIoDecoder decodes REAL png/bmp/gif bytes: dims, format, pixel luma") {
    // encode with three different JVM writers, decode through the
    // boundary — no stub anywhere in this path
    def encode(fmt: String, w: Int, h: Int, gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val d = Multimodal.ImageIoDecoder
    d.open()
    for ((fmt, w, h, g) <- Seq(("png", 7, 3, 200), ("bmp", 4, 9, 17),
        ("gif", 5, 5, 255))) {
      val (dw, dh, df, luma, np) = d.decodeWithStats(encode(fmt, w, h, g), "image")
      assert((dw, dh, df) == (w, h, fmt), s"$fmt: got ($dw,$dh,$df)")
      assert(np == w.toLong * h)
      // constant gray: BT.601 luma == gray exactly (299+587+114 = 1000),
      // png/bmp lossless; gif 255 is in any palette
      assert(luma == g.toLong * w * h, s"$fmt: luma=$luma")
    }
    // fallbacks: garbage bytes and non-image kinds never throw
    assert(d.decodeWithStats(Array[Byte](1, 2, 3), "image") ==
      ((0, 0, "undecodable", 0L, 0L)))
    assert(d.decodeWithStats(encode("png", 2, 2, 9), "audio") ==
      ((0, 0, "not-image", 0L, 0L)))
  }

  test("decodeAssetsWithStats runs ImageIoDecoder distributed over real PNGs") {
    val assets = (0L until 30L).map { id =>
      (id, "image",
        Multimodal.syntheticPng((1 + id % 4).toInt, (1 + id % 3).toInt,
          (id * 8 % 256).toInt))
    }.toDF("asset_id", "kind", "payload").repartition(5)
    val got = Multimodal.decodeAssetsWithStats(assets, Multimodal.ImageIoDecoder)
      .select("asset_id", "width", "height", "format", "luma_sum", "n_pixels")
      .as[(Long, Int, Int, String, Long, Long)].collect()
    assert(got.length == 30)
    got.foreach { case (id, w, h, f, luma, np) =>
      assert(w == 1 + id % 4 && h == 1 + id % 3 && f == "png")
      assert(np == w.toLong * h && luma == (id * 8 % 256) * np)
    }
  }

  test("multimodal resize: bounded box, aspect kept, audio passthrough, no upscale") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    val assets = Multimodal.decodeAssets(Multimodal.packAssets(docs, "doc_id", "text"))
    val orig = assets.select("asset_id", "kind", "meta.width", "meta.height")
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    val origLen = assets.select(col("asset_id"), length(col("payload")))
      .as[(Long, Int)].collect().toMap
    val resized = Multimodal.resizeAssets(assets, maxW = 256, maxH = 256)
    assert(resized.schema == Multimodal.assetSchema) // production shape kept
    val out = resized.select(col("asset_id"), col("kind"), col("meta.width"),
        col("meta.height"), length(col("payload")))
      .as[(Long, String, Int, Int, Int)].collect()
    assert(out.length == 60)
    out.foreach { case (id, kind, nw, nh, nlen) =>
      val (_, _, w, h) = orig(id)
      if (kind == "audio") {
        assert(nw == w && nh == h && nlen == origLen(id)) // passthrough
      } else {
        assert(nw <= 256 && nh <= 256 && nw <= w && nh <= h) // in box, no upscale
        assert(nlen <= origLen(id) && nlen >= 1)
        // aspect preserved up to the shared truncating ppm scale
        val scale = math.min(1000000L,
          math.min(256L * 1000000 / w, 256L * 1000000 / h))
        assert(nw == math.max(1L, w * scale / 1000000).toInt)
        assert(nh == math.max(1L, h * scale / 1000000).toInt)
      }
    }
  }
}
