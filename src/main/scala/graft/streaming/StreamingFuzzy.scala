package graft.streaming

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Streaming fuzzy (edit-distance) duplicate detection — the live face of
 * [[FuzzyJoin.editDistancePairs]], same PassJoin blocking: every arriving
 * string emits its d+1 index segments AND its probe substrings, keyed by
 * `(partnerLen, segIdx, segment)`; a bucket's state remembers the FIRST
 * in-watermark claimant of each ROLE (index/probe), and an arrival of the
 * opposite role verifies the exact threshold Levenshtein INLINE against
 * the stored string — emitted pairs are true matches, never candidates.
 *
 * Recall contract mirrors [[StreamingDedup]]: each bucket pairs against
 * its first claimant only (two later arrivals that collide ONLY in an
 * already-claimed bucket are missed) — the streaming trade for O(1) state
 * per bucket; the batch join is the complete sweep, this is the
 * low-latency tripwire in front of it. State is bounded by event-time
 * timeout one watermark-delay past stream progress, and each bucket holds
 * at most two (id, string) entries. A pair colliding in several buckets
 * emits once per bucket — hits are exact and idempotent, consumers
 * dedupe downstream (the batch face pays one `distinct` for the same
 * reason).
 */
object StreamingFuzzy {

  final case class KeyRow(bucket: String, role: Boolean, id: Long, s: String,
    ts: java.sql.Timestamp)
  final case class BucketState(segId: Long, segS: String, subId: Long, subS: String)
  final case class FuzzyHit(id_a: Long, id_b: Long, dist: Int)

  /** Levenshtein with early-exit threshold (scalar twin of the codegen'd
   * verify — banded DP, returns -1 past maxDist). */
  private[streaming] def boundedDistance(a: String, b: String, maxDist: Int): Int = {
    if (math.abs(a.length - b.length) > maxDist) return -1
    val n = a.length; val m = b.length
    val dp = Array.tabulate(n + 1)(i => i)
    var j = 1
    while (j <= m) {
      var prev = dp(0); dp(0) = j
      var best = dp(0)
      var i = 1
      while (i <= n) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
        if (dp(i) < best) best = dp(i)
        i += 1
      }
      if (best > maxDist) return -1
      j += 1
    }
    if (dp(n) <= maxDist) dp(n) else -1
  }

  def streamingFuzzyPairs(
      stream: DataFrame, idCol: String, strCol: String, tsCol: String,
      watermark: String, maxDist: Int): Dataset[FuzzyHit] = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val d = maxDist
    val spark = stream.sparkSession
    import spark.implicits._
    val base = stream
      .withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("graft_id"),
        col(strCol).cast("string").as("graft_s"), col(tsCol).as("graft_ts"))
      .where(col("graft_s").isNotNull)
      .withColumn("graft_len", length(col("graft_s")))
    // the batch operator's own key generators, both roles exploded from
    // ONE projection (no stream-stream self-join); role=true is the index
    // (segment) side
    val tagged = base.select(col("graft_id"), col("graft_s"), col("graft_ts"),
      explode(concat(
        transform(FuzzyJoin.segKeyArray(col("graft_s"), col("graft_len"), d),
          x => struct(x.getField("gl").as("gl"), x.getField("gi").as("gi"),
            x.getField("gseg").as("gseg"), lit(true).as("role"))),
        transform(FuzzyJoin.subKeyArray(col("graft_s"), col("graft_len"), d),
          x => struct(x.getField("gl").as("gl"), x.getField("gi").as("gi"),
            x.getField("gseg").as("gseg"), lit(false).as("role"))))).as("graft_k"))
    tagged.select(
        concat_ws(":", col("graft_k.gl"), col("graft_k.gi"),
          col("graft_k.gseg")).as("bucket"),
        col("graft_k.role").as("role"), col("graft_id").as("id"),
        col("graft_s").as("s"), col("graft_ts").as("ts"))
      .as[KeyRow]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[KeyRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic within a batch: lowest id first, like the
            // exact-dedup face
            val batch = rows.toArray.sortBy(r => (r.id, !r.role))
            var st = state.getOption.getOrElse(BucketState(-1L, null, -1L, null))
            val out = Seq.newBuilder[FuzzyHit]
            batch.foreach { r =>
              val otherId = if (r.role) st.subId else st.segId
              val otherS = if (r.role) st.subS else st.segS
              if (otherS != null && otherId != r.id) {
                val dist = boundedDistance(r.s, otherS, d)
                if (dist >= 0)
                  out += FuzzyHit(math.min(r.id, otherId), math.max(r.id, otherId), dist)
              }
              if (r.role && st.segS == null) st = st.copy(segId = r.id, segS = r.s)
              if (!r.role && st.subS == null) st = st.copy(subId = r.id, subS = r.s)
            }
            state.update(st)
            // retire one FULL watermark-delay past the bucket's last
            // activity (not wm+1, which would kill the bucket on the very
            // next stream progress — cross-batch pairs need the window)
            if (batch.nonEmpty)
              state.setTimeoutTimestamp(batch.map(_.ts.getTime).max, watermark)
            out.result().iterator
          }
      }
  }
}
