package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.{QueryDef, Tables}
import graft.functions.Rounding.{r4, r6}

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, plus a batched decode/feature-extract stage.
  *
  * The decode step is a DETERMINISTIC FAKE (no image/audio libs in this
  * container): it derives a byte histogram + checksum from the blob. The
  * Spark-side plumbing is the real design — typed Dataset, binary column,
  * batched mapPartitions (the shape a JNI/py-batch decoder needs: amortize
  * per-batch init, bounded memory per task), metadata travels beside the
  * blob so pruning `feat` columns never drags blob bytes through a shuffle.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (SURVEY.md §1.4 maps the
    * reference's `Message[[]byte]` envelope to exactly this shape). */
  final case class MediaRecord(doc_id: Long, blob: Array[Byte], mime: String,
      width: Int, height: Int)

  final case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: Long,
      mean_byte: Double, hist8: Array[Double])

  /** Deterministic stand-in for a real decoder (would be libjpeg/ffmpeg via
    * a per-batch native call). Pure function of the bytes. */
  private[operators] def decodeStub(r: MediaRecord): MediaFeatures = {
    val hist = new Array[Double](8)
    var sum = 0L
    var crc = 17L
    var i = 0
    while (i < r.blob.length) {
      val b = r.blob(i) & 0xff
      hist(b >> 5) += 1
      sum += b
      crc = crc * 31 + b
      i += 1
    }
    val n = math.max(r.blob.length, 1)
    MediaFeatures(r.doc_id, r.blob.length, crc,
      sum.toDouble / n, hist.map(_ / n))
  }

  /** Build the typed media dataset from `documents` (text bytes stand in
    * for media payloads; metadata is derived deterministically). */
  def mediaDataset(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob"),
        lit("text/plain").as("mime"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))
      .as[MediaRecord]
  }

  // ---------------------------------------------------------------- m01
  /** Metadata projection over the binary column — shows blob columns
    * coexisting with relational ops (oracle-matched via octet_length). */
  val m01Meta = QueryDef(
    "m01_multimodal_meta",
    (s, d) => {
      mediaDataset(s, d).toDF()
        .select(col("doc_id"), octet_length(col("blob")).as("n_bytes"),
          col("mime"), col("width"), col("height"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
           |  'text/plain' AS mime,
           |  CAST(n_chars % 640 AS INT) AS width,
           |  CAST(n_chars % 480 AS INT) AS height
           |FROM documents ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- m02
  /** Batched decode + feature extraction via mapPartitions: batches of 64
    * records per decoder call (the real-world shape for native/python
    * decoders), features emitted as typed rows.
    *
    * Oracle-matched (round 3): the polynomial checksum's Java `Long`
    * wraparound is replayed in the oracle with HUGEINT mod-2^64
    * arithmetic + a signed fold, and the byte walk as an ord() list over
    * the (all-ASCII) payload — proving the JVM-side decoder plumbing
    * byte-for-byte against an independent engine. */
  val m02Features = QueryDef(
    "m02_multimodal_features",
    (s, d) => {
      import s.implicits._
      mediaDataset(s, d)
        .mapPartitions { it =>
          // batch boundary models per-batch decoder init/teardown
          it.grouped(64).flatMap { batch => batch.map(decodeStub) }
        }
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("checksum"),
          r4(col("mean_byte")).as("mean_byte"),
          r4(element_at(col("hist8"), 1)).as("hist_0"))
        .orderBy("doc_id")
    },
    Some("""WITH bytes AS (
           |  SELECT doc_id,
           |    list_transform(range(1, length(text)+1),
           |      i -> ord(substr(text, i, 1))) AS bs,
           |    length(text) AS n
           |  FROM documents),
           |acc AS (
           |  SELECT doc_id, bs, n,
           |    list_reduce(
           |      list_prepend(17::HUGEINT, list_transform(bs, b -> b::HUGEINT)),
           |      (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS crc
           |  FROM bytes)
           |SELECT doc_id, CAST(n AS INT) AS n_bytes,
           |  CAST(CASE WHEN crc >= 9223372036854775808::HUGEINT
           |            THEN crc - 18446744073709551616::HUGEINT ELSE crc END
           |       AS BIGINT) AS checksum,
           |  round(CAST(list_sum(bs) AS DOUBLE) / n, 4) AS mean_byte,
           |  round(CAST(len(list_filter(bs, b -> b < 32)) AS DOUBLE) / n, 4) AS hist_0
           |FROM acc ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- m03
  /** Frame sampling over an opaque media payload: treat the blob as a
    * sequence of fixed-size frames (256 B stands in for a codec's frame
    * table), keep every 4th frame, and fingerprint the sampled bytes —
    * the video-pipeline shape (sample → decode → embed) with the decode
    * stubbed as an md5 over the frame's actual bytes.
    *
    * Scale shape: `sequence` + `explode` fan out row-local (no shuffle,
    * no driver state); the blob is sliced lazily per sampled frame, so
    * unsampled bytes are never copied. The whole query is a narrow
    * projection over the scan. The corpus is ASCII, so byte slicing ==
    * substring and the md5 replays exactly in the oracle. */
  val m03FrameSample = QueryDef(
    "m03_frame_sample",
    (s, d) => {
      val FrameBytes = 256
      val Stride = 4
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          (length(col("text")).cast("int") / FrameBytes).cast("int").as("n_frames"))
        .filter(col("n_frames") > 0)
        .select(col("doc_id"), col("text"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(Stride))).as("frame_idx"))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
          (col("frame_idx") * FrameBytes).as("byte_off"),
          md5(col("text").substr(col("frame_idx") * FrameBytes + 1, lit(FrameBytes))
            .cast("binary")).as("frame_fp"))
        .orderBy("doc_id", "frame_idx")
    },
    Some("""WITH sized AS (
           |  SELECT doc_id, text, CAST(length(text) // 256 AS INT) AS n_frames
           |  FROM documents WHERE length(text) // 256 > 0),
           |frames AS (
           |  SELECT doc_id, text, n_frames,
           |    CAST(unnest(range(0, n_frames, 4)) AS INT) AS frame_idx
           |  FROM sized)
           |SELECT doc_id, n_frames, frame_idx,
           |  CAST(frame_idx * 256 AS INT) AS byte_off,
           |  md5(substring(text, frame_idx * 256 + 1, 256)) AS frame_fp
           |FROM frames ORDER BY doc_id, frame_idx""".stripMargin))

  // ---------------------------------------------------------------- m04
  /** Media near-duplicate detection via shared frame fingerprints: slice
    * each blob into fixed 64-byte frames (stride 1 — every frame, unlike
    * m03's sampler), fingerprint each frame, and report document pairs
    * sharing ≥ 2 distinct frame fingerprints with a containment score
    * `shared / min(n_frames)`. This is the video/image dedup shape —
    * frame-fingerprint posting lists — applied to opaque blobs; the
    * byte-frame granularity makes it the multimodal sibling of the
    * token-shingle d05.
    *
    * Scale shape: (doc, fp) posting lists → equi-join on fp → per-pair
    * hash-agg; work is proportional to actual fingerprint collisions,
    * never all-pairs. A pathological hot fingerprint (a constant-color
    * frame) would salt like q36; the corpus here has no such frame. */
  val m04MediaNearDup = QueryDef(
    "m04_media_neardup",
    (s, d) => {
      val FrameBytes = 64
      val frames = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          (length(col("text")).cast("int") / FrameBytes).cast("int")
            .as("n_frames"))
        .filter(col("n_frames") > 0)
        .select(col("doc_id"), col("text"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1)).as("i"))
        .select(col("doc_id"), col("n_frames"),
          md5(col("text").substr(col("i") * FrameBytes + 1, lit(FrameBytes))
            .cast("binary")).as("fp"))
        .distinct()
      frames.as("a").join(frames.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n_frames").as("nf_a"), col("b.n_frames").as("nf_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .select(col("doc_a"), col("doc_b"), col("shared"),
          r4(col("shared").cast("double") /
            least(col("nf_a"), col("nf_b"))).as("containment"))
        .orderBy("doc_a", "doc_b")
    },
    Some("""WITH sized AS (
           |  SELECT doc_id, text, CAST(length(text) // 64 AS INT) AS n_frames
           |  FROM documents WHERE length(text) // 64 > 0),
           |f AS (
           |  SELECT DISTINCT doc_id, n_frames,
           |    md5(substring(text, i * 64 + 1, 64)) AS fp
           |  FROM sized, unnest(range(0, n_frames)) AS t(i)),
           |p AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |         a.n_frames AS nf_a, b.n_frames AS nf_b,
           |         count(*) AS shared
           |  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2, 3, 4)
           |SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared,
           |  round(shared / CAST(least(nf_a, nf_b) AS DOUBLE) * 10000) / 10000
           |    AS containment
           |FROM p WHERE shared >= 2 ORDER BY doc_a, doc_b""".stripMargin))

  // ---------------------------------------------------------------- m05
  /** Energy-gated segment extraction — the audio VAD (voice-activity
    * detection) shape: slice each blob into 64-byte frames, score a
    * per-frame "energy", gate at a threshold, and merge consecutive
    * active frames into segments (gaps-and-islands), dropping segments
    * shorter than 2 frames the way real VADs enforce a minimum speech
    * duration. This is the silence-trimming / speech-segmentation stage
    * of an audio training-data pipeline. The energy here is the count of
    * a reference byte in the frame — a deterministic stand-in for RMS
    * loudness, same contract as decodeStub (median ≈ threshold, so the
    * gate genuinely splits documents into multiple islands).
    *
    * Scale shape: row-local frame explode → filter → ONE window on
    * doc_id (high-cardinality key; per-doc frame count bounded by blob
    * size) → hash-agg on (doc, island). No joins, no low-card
    * partitions. */
  /** The (doc_id, frame_idx, energy) frame table of ACTIVE frames —
    * m05's input stage, shared with the streaming twin's feed so batch
    * and incremental segmentation consume identical rows. */
  private[graft] def activeFrames(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val FrameBytes = 64
    val MinEnergy = 5
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        (length(col("text")).cast("int") / FrameBytes).cast("int")
          .as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"),
        col("text").substr(col("frame_idx") * FrameBytes + 1,
          lit(FrameBytes)).as("fr"))
      .select(col("doc_id"), col("frame_idx"),
        (length(col("fr")) - length(replace(col("fr"), lit("e"), lit(""))))
          .as("energy"))
      .filter(col("energy") >= MinEnergy)
  }

  val m05VadSegments = QueryDef(
    "m05_vad_segments",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val active = activeFrames(s, d)
      val w = Window.partitionBy("doc_id").orderBy("frame_idx")
      active
        .withColumn("island", col("frame_idx") - row_number().over(w))
        .groupBy(col("doc_id"), col("island"))
        .agg(min("frame_idx").as("seg_start"), max("frame_idx").as("seg_end"),
          count(lit(1)).as("n_frames"),
          r4(avg(col("energy"))).as("mean_energy"))
        .filter(col("n_frames") >= 2)
        .select(col("doc_id"), col("seg_start"), col("seg_end"),
          col("n_frames"), col("mean_energy"))
        .orderBy("doc_id", "seg_start")
    },
    Some("""WITH sized AS (
           |  SELECT doc_id, text, CAST(length(text) // 64 AS INT) AS n_frames
           |  FROM documents WHERE length(text) // 64 > 0),
           |fr AS (
           |  SELECT doc_id, CAST(i AS INT) AS frame_idx,
           |    substring(text, CAST(i AS INT) * 64 + 1, 64) AS fr
           |  FROM sized, unnest(range(0, n_frames)) AS t(i)),
           |en AS (
           |  SELECT doc_id, frame_idx,
           |    length(fr) - length(replace(fr, 'e', '')) AS energy
           |  FROM fr),
           |act AS (SELECT * FROM en WHERE energy >= 5),
           |isl AS (
           |  SELECT doc_id, frame_idx, energy,
           |    frame_idx - row_number()
           |      OVER (PARTITION BY doc_id ORDER BY frame_idx) AS island
           |  FROM act),
           |agg AS (
           |  SELECT doc_id, island,
           |    min(frame_idx) AS seg_start, max(frame_idx) AS seg_end,
           |    CAST(count(*) AS BIGINT) AS n_frames,
           |    round(avg(energy), 4) AS mean_energy
           |  FROM isl GROUP BY 1, 2)
           |SELECT doc_id, seg_start, seg_end, n_frames, mean_energy
           |FROM agg WHERE n_frames >= 2 ORDER BY doc_id, seg_start""".stripMargin))

  // ---------------------------------------------------------------- m06
  /** Content-defined chunking (CDC) dedup over the binary column — the
    * rsync/restic/LLM-blob-store dedup shape: a polynomial rolling hash
    * over a 16-byte window cuts a chunk wherever `hash % 64 == 0`
    * (bounded to [16, 256] bytes), so boundaries depend on CONTENT, not
    * offsets — inserting a byte reshifts only the chunks around the
    * edit, unlike fixed-window chunking (t16) where one insertion
    * re-fingerprints the whole tail. Chunks are md5'd and duplicate
    * bytes counted per source.
    *
    * Scale shape: the chunker is a typed flatMap (the m02 batched-
    * decoder convention — per-row byte scan, embarrassingly parallel),
    * followed by one map-side-combined hash-agg on (source, chunk md5)
    * and one per-source rollup.
    *
    * FULLY ORACLE-CHECKED (round 11, the last multimodal flip): the cut
    * condition `(h & 63) == 0` only reads the rolling hash's low 6 bits,
    * and 257 ≡ 1 (mod 64), so the whole wrapping-2^64 polynomial
    * collapses mod 64 to a windowed BYTE SUM — the DuckDB oracle replays
    * the chunker as a per-byte recursive CTE over that sum (blobs are
    * ≤ 577 bytes), cuts chunks with the same [16, 256] bounds, and
    * md5's the same substrings. The CDC locality property — planted
    * shared regions dedupe, an insertion resyncs — stays pinned in
    * AnalyticsInvariantSpec as the quality gate. */
  final case class Chunk(source: String, doc_id: Long, md5: String, len: Int)

  /** Cut points via polynomial rolling hash over a 16-byte window. */
  private[graft] def chunksOf(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val Min = 16; val Max = 256; val W = 16
    val out = Seq.newBuilder[(Int, Int)]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 257 + (bytes(i) & 0xff)
      if (i - start + 1 >= W) {
        // subtract the byte leaving the window: 257^(W-1) mod 2^63 fits
        h -= powTable(W - 1) * (bytes(i - W + 1) & 0xff)
      }
      val len = i - start + 1
      if ((len >= Min && (h & 63L) == 0L) || len >= Max) {
        out += ((start, len)); start = i + 1; h = 0L
      }
      i += 1
    }
    if (start < bytes.length) out += ((start, bytes.length - start))
    out.result()
  }
  private val powTable: Array[Long] = {
    val t = new Array[Long](17); t(0) = 1L
    for (i <- 1 to 16) t(i) = t(i - 1) * 257L
    t
  }

  val m06CdcDedup = QueryDef(
    "m06_cdc_chunk_dedup",
    (s, d) => {
      import s.implicits._
      val blobs = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("text").cast("binary").as("blob"))
        .as[(String, Long, Array[Byte])]
      val chunks = blobs.flatMap { case (src, id, blob) =>
        chunksOf(blob).map { case (off, len) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          md.update(blob, off, len)
          Chunk(src, id,
            md.digest().map(b => f"$b%02x").mkString, len)
        }
      }
      chunks.groupBy("source", "md5")
        .agg(count(lit(1)).as("n_occ"), first(col("len")).as("len"))
        .groupBy("source")
        .agg(sum("n_occ").as("n_chunks"),
          count(lit(1)).as("n_distinct"),
          sum(col("n_occ") * col("len")).as("total_bytes"),
          sum((col("n_occ") - 1) * col("len")).as("dup_bytes"))
        .withColumn("dedup_ratio",
          r4(col("dup_bytes").cast("double") / col("total_bytes")))
        .orderBy("source")
    },
    // the per-byte chunker recursion, replayed: state (start, h mod 64)
    // advances one byte per recursive step across all docs at once; a
    // step whose post-update hash hits 0 past the 16-byte minimum (or
    // that reaches the 256-byte cap) marks a cut and resets. Chunk
    // spans come from lag(start) over the cut rows; tails close at EOF.
    // Documents are ASCII (verified at all SFs), so VARCHAR positions
    // are byte positions and md5(substr(...)) hashes the same bytes as
    // the Spark side's MessageDigest over the blob slice.
    Some("""WITH RECURSIVE docs AS (
           |  SELECT source, doc_id, text, length(text) AS L FROM documents),
           |steps AS (
           |  SELECT source, doc_id, text, L, 0 AS i, 0 AS start,
           |    0 AS h, FALSE AS cut
           |  FROM docs
           |  UNION ALL
           |  SELECT source, doc_id, text, L, i + 1 AS i,
           |    CASE WHEN cut2 THEN i + 1 ELSE start END AS start,
           |    CASE WHEN cut2 THEN 0 ELSE h2 END AS h,
           |    cut2 AS cut
           |  FROM (
           |    SELECT source, doc_id, text, L, i, start,
           |      ((h + ord(substr(text, i + 1, 1))
           |        - CASE WHEN i + 1 - start >= 16
           |               THEN ord(substr(text, i + 1 - 15, 1))
           |               ELSE 0 END) % 64 + 64) % 64 AS h2,
           |      ((i + 1 - start >= 16 AND ((h + ord(substr(text, i + 1, 1))
           |        - CASE WHEN i + 1 - start >= 16
           |               THEN ord(substr(text, i + 1 - 15, 1))
           |               ELSE 0 END) % 64 + 64) % 64 = 0)
           |       OR i + 1 - start >= 256) AS cut2
           |    FROM steps WHERE i < L) s
           |),
           |cuts AS (
           |  SELECT source, doc_id, substr(text, start + 1, i - start) AS chunk
           |  FROM (SELECT source, doc_id, text, i, lag(start) OVER w AS start
           |        FROM steps WHERE cut OR i = 0
           |        WINDOW w AS (PARTITION BY doc_id ORDER BY i)) t
           |  WHERE start IS NOT NULL
           |),
           |tails AS (
           |  SELECT source, doc_id, substr(text, start + 1, L - start) AS chunk
           |  FROM steps WHERE i = L AND start < L
           |),
           |chunks AS (
           |  SELECT source, doc_id, md5(chunk) AS md5, length(chunk) AS len
           |  FROM (SELECT * FROM cuts UNION ALL SELECT * FROM tails)
           |),
           |per AS (SELECT source, md5, count(*) AS n_occ, first(len) AS len
           |        FROM chunks GROUP BY source, md5)
           |SELECT source, CAST(sum(n_occ) AS BIGINT) AS n_chunks,
           |  count(*) AS n_distinct,
           |  CAST(sum(n_occ * len) AS BIGINT) AS total_bytes,
           |  CAST(sum((n_occ - 1) * len) AS BIGINT) AS dup_bytes,
           |  round(CAST(sum((n_occ - 1) * len) AS DOUBLE)
           |    / sum(n_occ * len), 4) AS dedup_ratio
           |FROM per GROUP BY source ORDER BY source""".stripMargin))

  // ---------------------------------------------------------------- m07
  /** Interleaved vision+text sequence assembly (the MMC4/OBELICS
    * dataloader manifest): each document contributes an image element
    * (fixed 64 vision tokens — the patch-embedding budget a VLM
    * reserves per image) followed by its text tokens, documents stay
    * atomic, and consecutive documents pack into 2048-token training
    * sequences. Output is the per-sequence manifest a dataloader
    * consumes: element counts, the vision/text token split, fill ratio,
    * and the first/last document (by pack order) bounding the slice.
    *
    * Scale shape: x06's salted distributed prefix sum (md5-bucket carry
    * base + within-bucket window) computes every document's cumulative
    * offset without a global single-partition window; the manifest is
    * one (source, bin) hash-agg with exact-integer argmin/argmax for
    * the boundary docs. */
  val m07InterleavedPack = QueryDef(
    "m07_interleaved_pack",
    (s, d) => {
      import graft.functions.{TextFunctions => T}
      import org.apache.spark.sql.expressions.Window
      val ctx = 2048.0
      val VisionTok = 64L
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          (size(T.tokens(col("text"))) + VisionTok).as("cost"),
          size(T.tokens(col("text"))).cast("long").as("tok"),
          md5(col("doc_id").cast("string")).as("h"))
        .withColumn("bkt", substring(col("h"), 1, 2))
      val wCarry = Window.partitionBy("source").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = docs.groupBy("source", "bkt")
        .agg(sum("cost").as("bcost"))
        .withColumn("base", coalesce(sum("bcost").over(wCarry), lit(0L)))
        .select("source", "bkt", "base")
      val wLocal = Window.partitionBy("source", "bkt")
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.join(broadcast(offsets), Seq("source", "bkt"))
        .withColumn("cum", col("base") + sum("cost").over(wLocal))
        .select(col("source"), col("doc_id"), col("tok"), col("cost"),
          col("cum"),
          floor((col("cum") - col("cost")) / lit(ctx)).cast("long").as("bin"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"),
          count(lit(1)).as("n_images"),
          (count(lit(1)) * VisionTok).as("vision_tokens"),
          sum("tok").as("text_tokens"),
          r4(sum("cost") / lit(ctx)).as("fill_ratio"),
          min_by(col("doc_id"), col("cum")).as("first_doc_id"),
          max_by(col("doc_id"), col("cum")).as("last_doc_id"))
        .orderBy("source", "bin")
    },
    Some("""WITH d AS (
           |  SELECT doc_id, source,
           |    len(string_split(text, ' ')) AS tok,
           |    len(string_split(text, ' ')) + 64 AS cost
           |  FROM documents),
           |c AS (
           |  SELECT source, doc_id, tok, cost,
           |    sum(cost) OVER (PARTITION BY source
           |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           |      ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM d)
           |SELECT source, CAST(floor((cum - cost) / 2048.0) AS BIGINT) AS bin,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(*) AS BIGINT) AS n_images,
           |  CAST(count(*) * 64 AS BIGINT) AS vision_tokens,
           |  CAST(sum(tok) AS BIGINT) AS text_tokens,
           |  round(sum(cost) / 2048.0 * 10000) / 10000 AS fill_ratio,
           |  arg_min(doc_id, cum) AS first_doc_id,
           |  arg_max(doc_id, cum) AS last_doc_id
           |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- m08
  /** Aspect-ratio bucket batching plan (the SDXL-style trick: group
    * images by nearest aspect bucket so a batch shares one canvas and
    * nothing is cropped to square). Each image goes to the bucket
    * minimizing |aspect − target| over a fixed 5-target ladder; per
    * bucket the plan reports batch count at batch-size 32 and the
    * padding waste the last partial batch costs.
    *
    * Scale shape: metadata-only — width/height ride beside the blob so
    * no payload bytes move; the 5-row bucket ladder is broadcast; the
    * argmin is a per-doc_id window over exactly 5 rows; one hash-agg
    * onto the bucket grid. Aspect means move as exact micro-unit
    * BIGINTs (integer div), so sums are order-proof. Zero-dimension
    * rows (invalid metadata) are excluded as decode rejects. */
  val m08AspectBuckets = QueryDef(
    "m08_aspect_buckets",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val targets =
        broadcast(Seq(0.5, 0.75, 1.0, 4.0 / 3.0, 2.0).toDF("target"))
      val v = mediaDataset(s, d).toDF()
        .filter(col("width") > 0 && col("height") > 0)
        .select(col("doc_id"),
          (col("width").cast("double") / col("height")).as("aspect"),
          expr("cast(width as bigint) * 1000000 div height").as("am"))
      val w = Window.partitionBy("doc_id")
        .orderBy(abs(col("aspect") - col("target")).asc, col("target").asc)
      v.crossJoin(targets)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .groupBy("target")
        .agg(count(lit(1)).as("n_images"), sum("am").as("sum_am"))
        .withColumn("n_batches", expr("(n_images + 31) div 32"))
        .withColumn("pad_waste", col("n_batches") * 32L - col("n_images"))
        .select(col("target").as("bucket_target"), col("n_images"),
          col("n_batches"), col("pad_waste"),
          r6(col("pad_waste").cast("double")
            / (col("n_batches") * 32L).cast("double")).as("pad_share"),
          r4(col("sum_am").cast("double") / col("n_images") / 1000000.0)
            .as("mean_aspect"))
        .orderBy("bucket_target")
    },
    Some("""WITH m AS (
           |  SELECT doc_id, CAST(n_chars % 640 AS INT) AS w,
           |    CAST(n_chars % 480 AS INT) AS h
           |  FROM documents),
           |v AS (
           |  SELECT doc_id, CAST(w AS DOUBLE) / h AS aspect,
           |    CAST(w AS BIGINT) * 1000000 // h AS am
           |  FROM m WHERE w > 0 AND h > 0),
           |t(target) AS (VALUES (CAST(0.5 AS DOUBLE)), (0.75), (1.0),
           |  (CAST(4 AS DOUBLE) / 3), (2.0)),
           |asg AS (
           |  SELECT doc_id, am, target,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY abs(aspect - target), target) AS rk
           |  FROM v CROSS JOIN t),
           |agg AS (
           |  SELECT target, CAST(count(*) AS BIGINT) AS n_images,
           |    CAST(sum(am) AS BIGINT) AS sum_am,
           |    CAST((count(*) + 31) // 32 AS BIGINT) AS n_batches
           |  FROM asg WHERE rk = 1 GROUP BY 1)
           |SELECT target AS bucket_target, n_images, n_batches,
           |  n_batches * 32 - n_images AS pad_waste,
           |  round(CAST(n_batches * 32 - n_images AS DOUBLE)
           |    / CAST(n_batches * 32 AS DOUBLE) * 1000000) / 1000000
           |    AS pad_share,
           |  round(CAST(sum_am AS DOUBLE) / n_images / 1000000 * 10000)
           |    / 10000 AS mean_aspect
           |FROM agg ORDER BY bucket_target""".stripMargin))

  // ---------------------------------------------------------------- m09
  /** Composed audio-dedup pipeline: m05's VAD segmentation → per-
    * segment content fingerprint → cross-corpus duplicate-segment
    * accounting per source — the end-to-end dedup an audio training
    * pipeline runs ("how much of each source's SPEECH is re-uploaded
    * elsewhere?"), and the multimodal sibling of x10's composed text
    * pipeline: every stage reuses the exact semantics of its
    * standalone oracle-matched operator (m05's islands, d02's
    * fingerprint-by-digest, q136's share grid). Planted near-dup
    * documents make the cross-source hits real, not vacuous.
    *
    * Scale shape: the frame explode + island window are m05's (one
    * doc_id window); the segment's bytes are fetched by ONE doc_id
    * equi-join back to the source table so the blob never rides the
    * frame shuffle (m01's pruning rule); fingerprint occurrence counts
    * are a digest-keyed hash-agg (posting-list, never pairwise); the
    * report is a source-grid rollup. */
  val m09SegmentDedup = QueryDef(
    "m09_segment_dedup",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val FrameBytes = 64
      val w = Window.partitionBy("doc_id").orderBy("frame_idx")
      val segs = activeFrames(s, d)
        .withColumn("island", col("frame_idx") - row_number().over(w))
        .groupBy(col("doc_id"), col("island"))
        .agg(min("frame_idx").as("seg_start"),
          max("frame_idx").as("seg_end"),
          count(lit(1)).as("n_frames"))
        .filter(col("n_frames") >= 2)
      val fp = segs.join(Tables.documents(s, d)
            .select(col("doc_id").as("did"), col("text"), col("source")),
          col("doc_id") === col("did"))
        .select(col("doc_id"), col("source"), col("seg_start"),
          md5(col("text").substr(
            col("seg_start") * FrameBytes + 1,
            (col("seg_end") - col("seg_start") + 1) * FrameBytes))
            .as("fp"))
      val occ = fp.groupBy("fp").agg(count(lit(1)).as("n_occ"),
        countDistinct(col("source")).as("n_src"))
      fp.join(occ, "fp")
        .groupBy("source")
        .agg(count(lit(1)).as("n_segments"),
          sum(when(col("n_occ") >= 2, 1L).otherwise(0L))
            .as("n_dup_segments"),
          sum(when(col("n_src") >= 2, 1L).otherwise(0L))
            .as("n_cross_source"))
        .withColumn("dup_ppm",
          expr("n_dup_segments * 1000000 div n_segments"))
        .orderBy("source")
    },
    Some("""WITH sized AS (
           |  SELECT doc_id, text,
           |    CAST(length(text) // 64 AS INT) AS n_frames
           |  FROM documents WHERE length(text) // 64 > 0),
           |fr AS (
           |  SELECT doc_id, CAST(i AS INT) AS frame_idx,
           |    substring(text, CAST(i AS INT) * 64 + 1, 64) AS fr
           |  FROM sized, unnest(range(0, n_frames)) AS t(i)),
           |act AS (
           |  SELECT doc_id, frame_idx
           |  FROM fr
           |  WHERE length(fr) - length(replace(fr, 'e', '')) >= 5),
           |isl AS (
           |  SELECT doc_id, frame_idx,
           |    frame_idx - row_number()
           |      OVER (PARTITION BY doc_id ORDER BY frame_idx) AS island
           |  FROM act),
           |segs AS (
           |  SELECT doc_id, island, min(frame_idx) AS seg_start,
           |    max(frame_idx) AS seg_end,
           |    CAST(count(*) AS BIGINT) AS n_frames
           |  FROM isl GROUP BY 1, 2 HAVING count(*) >= 2),
           |fp AS (
           |  SELECT segs.doc_id, d.source,
           |    md5(substring(d.text, seg_start * 64 + 1,
           |      (seg_end - seg_start + 1) * 64)) AS fp
           |  FROM segs JOIN documents d ON segs.doc_id = d.doc_id),
           |occ AS (
           |  SELECT fp, CAST(count(*) AS BIGINT) AS n_occ,
           |    CAST(count(DISTINCT source) AS BIGINT) AS n_src
           |  FROM fp GROUP BY 1)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_segments,
           |  CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_dup_segments,
           |  CAST(sum(CASE WHEN n_src >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_cross_source,
           |  CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END)
           |    * 1000000 // count(*) AS BIGINT) AS dup_ppm
           |FROM fp JOIN occ USING (fp)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[QueryDef] = Seq(m01Meta, m02Features, m03FrameSample,
    m04MediaNearDup, m05VadSegments, m06CdcDedup, m07InterleavedPack,
    m08AspectBuckets, m09SegmentDedup)
}
