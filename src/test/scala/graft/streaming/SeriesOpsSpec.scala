package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class SeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Day = SeriesOps.DayMicros

  test("streaming anomaly equals batch z-scores under shuffled-" +
      "within-delay feed") {
    implicit val sqlCtx = spark.sqlContext
    val types = Seq("view", "click", "purchase")
    val rng = new scala.util.Random(71)
    // 16 days x 3 types; day 12 spikes so real anomalies exist, plus
    // per-(type, day) variation so sd > 0 windows dominate
    val events = for {
      d <- 0 until 16
      (t, ti) <- types.zipWithIndex
      n = if (d == 12 && ti == 0) 25 else 1 + (d * 7 + ti * 3) % 5
      i <- 0 until n
    } yield SeriesOps.SeriesEvent(t,
      d.toLong * Day + i.toLong * 1000000L + rng.nextInt(1000))
    // shuffle in 2-day blocks (< 48h displacement) fed in chunks that
    // cross micro-batch boundaries
    val perDay = events.groupBy(_.tsMicros / Day).toSeq.sortBy(_._1)
    val shuffled = perDay.map(_._2).grouped(2)
      .flatMap(b => rng.shuffle(b.flatten)).toSeq
    val sentinel = SeriesOps.SeriesEvent("zzz",
      events.map(_.tsMicros).max + 10L * Day)
    val stream = MemoryStream[SeriesOps.SeriesEvent]
    val query = SeriesOps.streamingAnomaly(stream.toDS(), "48 hours")
      .writeStream.format("memory").queryName("anom_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      shuffled.grouped(40).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      stream.addData(sentinel)
      query.processAllAvailable()
      val streamed = spark.table("anom_stream").collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-7, -1)
      val batch = events.toDF("event_type", "tsMicros")
        .select(col("event_type"),
          timestamp_micros(col("tsMicros")).as("ts"))
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("mu", avg("n").over(w))
        .withColumn("sd", stddev_samp(col("n")).over(w))
        .withColumn("nw", count("n").over(w))
        .filter(col("nw") === 7 && col("sd") > 0)
        .select(col("day"), col("event_type"), col("n"),
          round((col("n") - col("mu")) / col("sd"), 6).as("z"))
        .collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamed == batch)
      // the spike day must actually surface as a strong positive z
      assert(batch.exists { case (_, t, _, z) => t == "view" && z > 3 },
        "degenerate fixture: no anomaly emitted")
    } finally query.stop()
  }

  test("streaming gapfill equals batch densified forward-filled " +
      "series under shuffled feed") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(37)
    // 3 users with different sparse active-day patterns (gaps of 1-4
    // days); values are exact binary fractions so any summation order
    // gives identical day averages
    val activeDays = Map(
      1L -> Seq(0, 1, 4, 5, 9, 10),
      2L -> Seq(2, 3, 8),
      3L -> Seq(0, 6, 7, 11))
    val events = for {
      (u, days) <- activeDays.toSeq
      d <- days
      i <- 0 until (1 + ((u + d) % 3)).toInt
    } yield SeriesOps.GapfillEvent(u,
      d.toLong * Day + i.toLong * 60000000L + rng.nextInt(1000),
      ((u * 7 + d * 3 + i) % 8) * 0.25)
    val perDay = events.groupBy(_.tsMicros / Day).toSeq.sortBy(_._1)
    val shuffled = perDay.map(_._2).grouped(2)
      .flatMap(b => rng.shuffle(b.flatten)).toSeq
    val sentinel = SeriesOps.GapfillEvent(999L,
      events.map(_.tsMicros).max + 10L * Day, 0.0)
    val stream = MemoryStream[SeriesOps.GapfillEvent]
    val query = SeriesOps.streamingGapfill(stream.toDS(), "48 hours")
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      shuffled.grouped(25).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      stream.addData(sentinel)
      query.processAllAvailable()
      val streamed = spark.table("gap_stream").collect()
        .map(r => (r.getLong(0), r.get(1).toString, r.getLong(2),
          r.getDouble(3))).toSet
      val wFill = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val daily = events.toDF("user_id", "tsMicros", "value")
        .select(col("user_id"),
          timestamp_micros(col("tsMicros")).as("ts"), col("value"))
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("day_avg"))
      val span = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val batch = span.select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
        .join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("day_avg"), ignoreNulls = true).over(wFill)
            .as("filled_avg"))
        .collect()
        .map(r => (r.getLong(0), r.get(1).toString, r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamed == batch)
      // gaps actually exercised: some n = 0 rows carry a fill forward
      assert(batch.exists(_._3 == 0L), "degenerate fixture: no gaps")
    } finally query.stop()
  }

  test("streaming EWMA equals the batch ordered fold on in-order " +
      "input across micro-batches; out-of-order fails loudly") {
    implicit val sqlCtx = spark.sqlContext
    val alpha = SeriesOps.EwmaAlpha
    val events = for {
      u <- 0L until 5L
      i <- 0 until 40
    } yield SeriesOps.EwmaEvent(u, u * 1000 + i, i.toLong * 1000000L,
      math.sin(u * 7.0 + i) * 10 + i)
    val stream = MemoryStream[SeriesOps.EwmaEvent]
    val query = SeriesOps.streamingEwma(stream.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      // in-order per user, split across 4 micro-batches
      events.groupBy(_.user_id).values.toSeq
        .flatMap(_.sortBy(_.tsMicros).grouped(10).zipWithIndex.map(_.swap))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .foreach { case (_, chunks) =>
          stream.addData(chunks.flatMap(_._2))
          query.processAllAvailable()
        }
      // last Update row per user is the final running value
      val streamed = spark.table("ewma_stream")
        .groupBy("user_id").agg(max(struct(col("n"), col("ewma"))).as("s"))
        .select(col("user_id"), col("s.n"), col("s.ewma"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val batch = events.groupBy(_.user_id).map { case (u, es) =>
        val xs = es.sortBy(e => (e.tsMicros, e.event_id)).map(_.value)
        val e = xs.tail.foldLeft(xs.head)((acc, x) =>
          alpha * x + (1 - alpha) * acc)
        (u, xs.length.toLong,
          BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }.toSet
      assert(streamed == batch)
    } finally query.stop()
    // an out-of-order event (older than the state frontier) surfaces
    val stream2 = MemoryStream[SeriesOps.EwmaEvent]
    val q2 = SeriesOps.streamingEwma(stream2.toDS())
      .writeStream.format("memory").queryName("ewma_stream_ooo")
      .outputMode(OutputMode.Update()).start()
    try {
      stream2.addData(SeriesOps.EwmaEvent(1L, 10L, 5000000L, 1.0))
      q2.processAllAvailable()
      stream2.addData(SeriesOps.EwmaEvent(1L, 11L, 1000000L, 2.0))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("out-of-order") ||
        Option(e.getCause).exists(_.getMessage.contains("out-of-order")))
    } finally q2.stop()
  }
}
