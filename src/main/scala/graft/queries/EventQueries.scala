package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Tables.t

/** Driver-gated queries over the `events` table: the batch twins of the
  * Structured Streaming pipelines in graft.streaming (same tumbling-window
  * semantics, oracled in SQL — SURVEY.md §7.4 keeps streaming itself out of
  * the correctness-gated set).
  */
object EventQueries {

  val all: Seq[Q] = Seq(

    // Tumbling 1-hour window aggregation (batch twin of
    // EventStreams.hourlyRollup; window(ts) start == date_trunc('hour')).
    Q("q_events_window",
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
        |       event_type, count(*) AS cnt,
        |       round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin) {
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            round(sum("value"), 4).as("total_value"))
          .select(col("window.start").as("hour_start"), col("event_type"),
            col("cnt"), col("total_value"))
          .orderBy("hour_start", "event_type")
    },

    // Multimodal metadata plumbing: opaque payload treated as bytes with
    // typed metadata derived scan-side (octet length, content checksum).
    // The decode stub itself (mapPartitions over binary) lives in
    // graft.multimodal and is exercised by MultimodalSpec.
    Q("q_multimodal_meta",
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       substr(md5(text), 1, 8) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          substring(md5(col("text")), 1, 8).as("checksum"))
        .orderBy("doc_id")
    },
  )
}
