package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.queries.Catalog.{Q, table, events}
import graft.queries.ExtShared._

/** Multimodal columns: metadata, decode, features, frame sampling, image/audio fingerprint dedup, silence segmentation.
  * Split from the former single Extensions.scala (round 7) for
  * navigability — zero behavior change; [[Extensions.all]] still
  * concatenates every family. */
private[queries] object ExtMultimodal {

  private val q41_multimodal_meta = Q(
    "q41_multimodal_meta",
    // Binary payload + typed metadata plumbing, projected to scalars
    // DuckDB can recompute (octet_length over the UTF-8 payload).
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, table(s, dir, "documents"))
      media.toDF()
        .select(
          col("id"),
          col("meta.mediaType").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          col("meta.durationMs").as("duration_ms"))
        .orderBy("id")
    },
    Some("""SELECT doc_id AS id,
      CASE WHEN doc_id % 3 = 0 THEN 'image'
        WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      CAST(n_chars * 10 AS BIGINT) AS duration_ms
      FROM documents ORDER BY id""")
  )

  private val q42_multimodal_features = Q(
    "q42_multimodal_features",
    // Full decode-stub feature extraction (mapPartitions batch path).
    // The stub features are pure byte math over the UTF-8 payload, so
    // DuckDB recomputes them independently: payload bytes via
    // hex-string decoding, the poly-31 rolling checksum via a HUGEINT
    // list_reduce with mod-2^64 wraparound, and the histogram feature
    // e0 as a REAL ratio — a true second-engine oracle for the whole
    // decode pipeline (schema, batching, and feature values).
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, table(s, dir, "documents"))
      Multimodal.extractFeatures(media).toDF()
        .select(
          col("id"), col("mediaType").as("media_type"),
          col("nBytes").as("n_bytes"), col("checksum"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e0"))
        .orderBy("id")
    },
    Some("""WITH b AS MATERIALIZED (
        SELECT doc_id, hex(encode(text)) AS hx FROM documents),
      byt AS MATERIALIZED (
        SELECT doc_id, list_transform(range(length(hx)//2),
          i -> (strpos('0123456789ABCDEF', hx[2*i+1:2*i+1])-1)*16
             + (strpos('0123456789ABCDEF', hx[2*i+2:2*i+2])-1)) AS bs
        FROM b),
      cs AS (
        SELECT doc_id, bs,
          list_reduce(list_prepend(1125899906842597::HUGEINT, bs),
            (h, x) -> (31*h + x) % 18446744073709551616::HUGEINT) AS ucs
        FROM byt)
      SELECT doc_id AS id,
        CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
          ELSE 'video' END AS media_type,
        CAST(len(bs) AS BIGINT) AS n_bytes,
        CAST(CASE WHEN ucs >= 9223372036854775808::HUGEINT
          THEN ucs - 18446744073709551616::HUGEINT ELSE ucs END AS BIGINT)
          AS checksum,
        CASE WHEN len(bs) = 0 THEN 0.0
          ELSE round(CAST(CAST(len(list_filter(bs, x -> x % 16 = 0)) AS REAL)
            / CAST(len(bs) AS REAL) AS DOUBLE), 6) END AS e0
      FROM cs ORDER BY id""")
  )

  private val q57_multimodal_frames = Q(
    "q57_multimodal_frames",
    // Video frame sampling: narrow flatMap fan-out (no payload
    // shuffle); offsets are pure integer math, recomputed by the
    // oracle from the metadata derivation.
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, table(s, dir, "documents"))
      Multimodal.sampleFrames(media, framesPerVideo = 4)
        .select(col("id"), col("frame_idx").cast("long").as("frame_idx"),
          col("offset_ms"))
        .orderBy("id", "frame_idx")
    },
    Some("""SELECT doc_id AS id, CAST(i AS BIGINT) AS frame_idx,
      CAST(i * (n_chars * 10) // 4 AS BIGINT) AS offset_ms
      FROM documents, range(4) t(i)
      WHERE doc_id % 3 = 2 AND n_chars * 10 > 0
      ORDER BY id, frame_idx""")
  )

  private val q98_multimodal_decode = Q(
    "q98_multimodal_decode",
    // REAL image decode, oracle-backed end to end: each doc id
    // deterministically generates an 8x8 grayscale image
    // (g(i) = (doc_id*31 + i*7) % 256, row-major), which is ENCODED to
    // actual BMP bytes (javax.imageio) and DECODED back through the
    // production ImageIoCodec — real container, real pixel read, the
    // full codec seam. The emitted 4x4-grid luminance means are pure
    // IEEE arithmetic on the recovered pixel values, so DuckDB
    // recomputes them from the generating formula: equality proves
    // the encode->decode round trip recovered every pixel exactly.
    (s, dir) => {
      val decodeUdf = udf((id: Long) => {
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < 64) {
          val g = ((id * 31 + i * 7) % 256).toInt
          img.setRGB(i % 8, i / 8, (g << 16) | (g << 8) | g)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "bmp", bos)
        graft.operators.Multimodal.ImageIoCodec.decode(bos.toByteArray)
      })
      table(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          posexplode(decodeUdf(col("doc_id"))).as(Seq("_d0", "c")))
        .select(col("doc_id"),
          (col("_d0") + 1).cast("long").as("dim"), col("c"))
        .orderBy("doc_id", "dim")
    },
    Some("""WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 100),
      px AS (SELECT doc_id, u.i AS i,
          CAST((doc_id*31 + u.i*7) % 256 AS DOUBLE) AS g
        FROM d CROSS JOIN unnest(range(0, 64)) AS u(i)),
      cells AS (SELECT doc_id,
          ((i // 8) // 2) * 4 + ((i % 8) // 2) AS cell,
          list(0.299*g + 0.587*g + 0.114*g ORDER BY i) AS lums
        FROM px GROUP BY doc_id, ((i // 8) // 2) * 4 + ((i % 8) // 2))
      SELECT doc_id, CAST(cell + 1 AS BIGINT) AS dim,
        CAST(list_aggregate(lums, 'sum') / 4 / 255.0 AS REAL) AS c
      FROM cells ORDER BY doc_id, dim""")
  )

  private val q194_image_dedup = Q(
    "q194_image_dedup",
    // Perceptual image dedup over REAL decoded pixels: each doc id
    // deterministically renders an 8x8 grayscale image (g(i) =
    // (doc_id*31 + i*7) % 256 — 31 is invertible mod 256, so ids
    // 256 apart render IDENTICAL pixels: planted duplicate images),
    // encodes it to actual BMP bytes, and the 64-bit average-hash
    // is computed from the ImageIO-decoded pixels
    // (Multimodal.averageHash64: 8x8 cell-mean luminance, bit = cell
    // >= in-order mean). Grouping by the hash is the image spelling
    // of digest dedup. DuckDB recomputes every hash BIT from the
    // generating formula, so equality proves decode -> downsample ->
    // threshold bit-for-bit, not just group counts.
    (s, dir) => {
      val hashUdf = udf((id: Long) => {
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < 64) {
          val g = ((id * 31 + i * 7) % 256).toInt
          img.setRGB(i % 8, i / 8, (g << 16) | (g << 8) | g)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "bmp", bos)
        Multimodal.averageHash64(bos.toByteArray)
      })
      val w = org.apache.spark.sql.expressions.Window.partitionBy("_h")
      table(s, dir, "documents").select(col("doc_id"))
        .withColumn("_h", hashUdf(col("doc_id")))
        .select(col("doc_id"),
          shiftrightunsigned(col("_h"), 32).as("hash_hi"),
          col("_h").bitwiseAND(lit(0xffffffffL)).as("hash_lo"),
          count(lit(1)).over(w).as("group_n"),
          min(col("doc_id")).over(w).as("canonical_id"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id FROM documents),
      px AS (SELECT doc_id, u.i AS i,
          0.299 * CAST((doc_id*31 + u.i*7) % 256 AS DOUBLE)
          + 0.587 * CAST((doc_id*31 + u.i*7) % 256 AS DOUBLE)
          + 0.114 * CAST((doc_id*31 + u.i*7) % 256 AS DOUBLE) AS lum
        FROM d CROSS JOIN unnest(range(0, 64)) AS u(i)),
      m AS (SELECT doc_id,
          list_aggregate(list(lum ORDER BY i), 'sum') / 64 AS mean
        FROM px GROUP BY doc_id),
      b AS (SELECT px.doc_id,
          CAST(sum(CASE WHEN i >= 32 AND lum >= mean
            THEN CAST(1 AS BIGINT) << (i - 32) ELSE 0 END) AS BIGINT)
            AS hash_hi,
          CAST(sum(CASE WHEN i < 32 AND lum >= mean
            THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS BIGINT)
            AS hash_lo
        FROM px JOIN m ON m.doc_id = px.doc_id GROUP BY px.doc_id),
      g AS (SELECT hash_hi, hash_lo, CAST(count(*) AS BIGINT) AS group_n,
          min(doc_id) AS canonical_id
        FROM b GROUP BY 1, 2)
      SELECT b.doc_id, b.hash_hi, b.hash_lo, g.group_n, g.canonical_id
      FROM b JOIN g ON g.hash_hi = b.hash_hi AND g.hash_lo = b.hash_lo
      ORDER BY b.doc_id""")
  )

  private val q195_audio_silence = Q(
    "q195_audio_silence",
    // Silence segmentation over REAL audio decode: each doc id
    // renders 160 frames of deterministic 16-bit PCM (segment k of
    // 10 frames is zeroed when (id+k) % 4 == 0 — planted silence),
    // wraps them in an actual WAV container (javax.sound), and the
    // per-segment RMS comes back through the production WavPcmCodec.
    // DuckDB recomputes each RMS from the sample formula (in-order
    // sum of squares, one sqrt, one float narrowing), so equality
    // proves the container parse + PCM read sample-exact; the silent
    // flag is the same threshold compare on both sides.
    (s, dir) => {
      val rmsUdf = udf((id: Long) => {
        val nFrames = 160
        val data = new Array[Byte](nFrames * 2)
        var t = 0
        while (t < nFrames) {
          val base = ((id * 31 + t * 17) % 2001 - 1000).toInt
          val sv = if ((id + t / 10) % 4 == 0) 0 else base
          data(2 * t) = (sv & 0xff).toByte
          data(2 * t + 1) = ((sv >> 8) & 0xff).toByte
          t += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Multimodal.WavPcmCodec.decode(bos.toByteArray)
      })
      table(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          posexplode(rmsUdf(col("doc_id"))).as(Seq("_s", "rms")))
        .select(col("doc_id"),
          (col("_s") + 1).cast("long").as("segment"), col("rms"),
          (col("rms") < 0.01).as("silent"))
        .orderBy("doc_id", "segment")
    },
    Some("""WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
      t AS (SELECT doc_id, u.t AS t, u.t // 10 AS seg,
          CASE WHEN (doc_id + u.t // 10) % 4 = 0 THEN 0
            ELSE (doc_id*31 + u.t*17) % 2001 - 1000 END AS s
        FROM d CROSS JOIN unnest(range(0, 160)) AS u(t)),
      q AS (SELECT doc_id, seg, list_aggregate(list(
          (CAST(s AS DOUBLE)/32768.0) * (CAST(s AS DOUBLE)/32768.0)
          ORDER BY t), 'sum') AS ss
        FROM t GROUP BY doc_id, seg)
      SELECT doc_id, CAST(seg + 1 AS BIGINT) AS segment,
        CAST(sqrt(ss / 10) AS REAL) AS rms,
        CAST(sqrt(ss / 10) AS REAL) < 0.01 AS silent
      FROM q ORDER BY doc_id, segment""")
  )

  private val q214_audio_dedup = Q(
    "q214_audio_dedup",
    // Acoustic-fingerprint dedup, completing the modality triad
    // (text digests, image aHash q194, audio here): docs 0..299
    // synthesize PCM keyed by doc_id % 128 — ids 128 apart render
    // BYTE-IDENTICAL audio — wrapped in real WAV containers and
    // fingerprinted through the production codec (16 RMS segments
    // quantized to 4 bits each). DuckDB recomputes every RMS,
    // every quantized nibble, and every duplicate group from the
    // sample formula.
    (s, dir) => {
      val fpUdf = udf((id: Long) => {
        val nFrames = 160
        val key = id % 128
        val data = new Array[Byte](nFrames * 2)
        var t = 0
        while (t < nFrames) {
          val base = ((key * 31 + t * 17) % 2001 - 1000).toInt
          val sv = if ((key + t / 10) % 4 == 0) 0 else base
          data(2 * t) = (sv & 0xff).toByte
          data(2 * t + 1) = ((sv >> 8) & 0xff).toByte
          t += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Multimodal.audioFingerprint64(bos.toByteArray)
      })
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("_fp")
      table(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 300)
        .withColumn("_fp", fpUdf(col("doc_id")))
        .select(col("doc_id"),
          shiftrightunsigned(col("_fp"), 32).as("fp_hi"),
          col("_fp").bitwiseAND(lit(0xffffffffL)).as("fp_lo"),
          count(lit(1)).over(w).as("group_n"),
          min(col("doc_id")).over(w).as("canonical_id"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id FROM documents
        WHERE doc_id < 300),
      t AS (SELECT doc_id, u.t AS t, u.t // 10 AS seg,
          CASE WHEN ((doc_id % 128) + u.t // 10) % 4 = 0 THEN 0
            ELSE ((doc_id % 128)*31 + u.t*17) % 2001 - 1000 END AS s
        FROM d CROSS JOIN unnest(range(0, 160)) AS u(t)),
      q AS (SELECT doc_id, seg, CAST(sqrt(list_aggregate(list(
          (CAST(s AS DOUBLE)/32768.0) * (CAST(s AS DOUBLE)/32768.0)
          ORDER BY t), 'sum') / 10) AS REAL) AS rms
        FROM t GROUP BY doc_id, seg),
      f AS (SELECT doc_id,
          CAST(sum(CASE WHEN seg < 8 THEN
            least(15, CAST(floor(CAST(rms AS DOUBLE) * 512)
              AS BIGINT)) << (4 * seg) ELSE 0 END) AS BIGINT)
            AS fp_lo,
          CAST(sum(CASE WHEN seg >= 8 THEN
            least(15, CAST(floor(CAST(rms AS DOUBLE) * 512)
              AS BIGINT)) << (4 * (seg - 8)) ELSE 0 END) AS BIGINT)
            AS fp_hi
        FROM q GROUP BY doc_id),
      g AS (SELECT fp_hi, fp_lo, CAST(count(*) AS BIGINT) AS group_n,
          min(doc_id) AS canonical_id FROM f GROUP BY 1, 2)
      SELECT f.doc_id, f.fp_hi, f.fp_lo, g.group_n, g.canonical_id
      FROM f JOIN g ON g.fp_hi = f.fp_hi AND g.fp_lo = f.fp_lo
      ORDER BY f.doc_id""")
  )

  val all: Seq[Q] = Seq(
    q41_multimodal_meta,
    q42_multimodal_features,
    q57_multimodal_frames,
    q98_multimodal_decode,
    q194_image_dedup,
    q195_audio_silence,
    q214_audio_dedup)
}
