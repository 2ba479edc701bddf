package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Q, Tables => T}

/** Multimodal-column operators — SURVEY.md §7.4 extension surface: media
  * payloads (image/audio/video) travel as opaque `binary` columns with a
  * typed metadata struct, and the decode / feature-extract / resize /
  * frame-sample stages run over them.
  *
  * ── WHAT IS REAL vs STUBBED ──
  * `mm_decode_meta` is a REAL container-header decode since round 4: the
  * codegen'd `image_meta` expression (graft.plans.ImageMeta) parses actual
  * PNG IHDR / BMP BITMAPINFOHEADER byte layouts from byte-faithful fixture
  * binaries. No PIXEL codec libraries exist in this environment, so the
  * remaining fakes are: frame-count/dims for the resize and frame-sample
  * planning queries (`fakeDims`, md5-derived) and "features" as
  * md5-derived integers instead of model embeddings (`md5Features`) — both
  * clearly factored so a real codec/model drops in behind the same
  * signatures. Everything around them is real and load-bearing: binary
  * columns, metadata structs, the per-partition batch iteration
  * (Dataset.mapPartitions — the Scala analog of mapInPandas: one iterator
  * per partition, codec state initialized once per partition, not per
  * row), frame explosion, and the pushdown-friendly projections.
  *
  * Scale: decode/feature stages are narrow maps (no shuffle); per-partition
  * codec initialization amortizes like an Arrow batch would; frame
  * sampling's explode stays inside the scan stage.
  */
object Multimodal {

  /** input/output rows for the mapPartitions feature stage */
  final case class MediaIn(doc_id: Long, text: String)
  final case class MediaFeat(doc_id: Long, features: Array[Long])

  /** STUB for a real feature extractor: 4 ints from the payload md5.
    * Mirrors the oracle's list_transform over md5 substrings. */
  def md5Features(payload: Array[Byte]): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    (0 until 4).map(i => java.lang.Long.parseLong(hex.substring(4 * i, 4 * i + 4), 16)).toArray
  }

  /** STUB for a real header parse: fake dims from md5 hex + byte length. */
  private def fakeDims(mediaMd5: org.apache.spark.sql.Column, sizeBytes: org.apache.spark.sql.Column) = (
    (conv(substring(mediaMd5, 1, 4), 16, 10).cast(LongType) % 240 + 16).as("width"),
    (conv(substring(mediaMd5, 5, 4), 16, 10).cast(LongType) % 240 + 16).as("height"),
    (sizeBytes % 90 + 1).as("n_frames"))

  private val FakeDimsSql =
    """CAST('0x'||substr(md5(text),1,4) AS BIGINT) % 240 + 16 AS width,
      |  CAST('0x'||substr(md5(text),5,4) AS BIGINT) % 240 + 16 AS height,
      |  octet_length(encode(text)) % 90 + 1 AS n_frames""".stripMargin

  /** input rows for the fixture-binary decode stage */
  final case class MediaBlob(doc_id: Long, media: Array[Byte])

  /** DuckDB-side mirror of the fixture-gray → integer-DCT → 63-bit
    * sign-hash pipeline (graft.plans.Phash), ending in `phh (doc_id, ph)`
    * — shared by the mm_phash_dedup and dd_incremental_phash oracles. The
    * DCT basis is the SAME integer literal table both engines use
    * (Phash.CtSql), so no libm drift is possible. */
  private val PhashSqlCtes: String = {
    val grayB = "CAST('0x'||substr(md5(concat(CAST(doc_id//4 AS VARCHAR), ':', " +
      "CAST(p AS VARCHAR))),1,2) AS BIGINT)"
    s"""pg AS (
       |  SELECT doc_id, list_transform(range(0,256), p ->
       |    CASE WHEN (doc_id % 4) > 0 AND ((p + doc_id % 4) % 29 = 0)
       |      THEN least($grayB + 16, 255) ELSE $grayB END) AS g
       |  FROM documents),
       |pco AS (
       |  SELECT doc_id, list_transform(range(0,64), b ->
       |    CAST(list_sum(list_transform(range(0,256), p ->
       |      g[CAST(p+1 AS INTEGER)]
       |      * ct[CAST((b//8)*16 + (p%16) + 1 AS INTEGER)]
       |      * ct[CAST((b%8)*16 + (p//16) + 1 AS INTEGER)])) AS BIGINT)) AS coefs
       |  FROM pg, (SELECT ${graft.plans.Phash.CtSql} AS ct)),
       |phh AS (
       |  SELECT doc_id, CAST(list_sum(list_transform(range(1,64), b ->
       |    CASE WHEN coefs[CAST(b+1 AS INTEGER)] > 0
       |         THEN CAST(pow(2, b-1) AS BIGINT) ELSE 0 END)) AS BIGINT) AS ph
       |  FROM pco)""".stripMargin
  }

  val queries: Seq[Q] = Seq(

    // Decode: binary payload → typed metadata struct, from REAL container
    // headers. Each document carries a byte-faithful PNG (doc_id%3=0),
    // BMP (=1) or JPEG (=2) header fixture with dims derived from doc_id
    // (graft.plans.ImageMeta.{pngFixture,bmpFixture,jpegFixture} — real
    // signature, IHDR + CRC32 / BITMAPINFOHEADER / walked marker-segment
    // layouts); the codegen'd `image_meta` expression parses the actual
    // width and height fields back out. The JPEG fixture carries a
    // doc_id-sized APP1 pad, so its SOF sits at a VARYING offset — a
    // parser that peeks at a fixed position instead of walking the
    // segment list goes red on size_bytes AND dims. The oracle pins
    // generator∘parser = identity; narrow map end to end; a full pixel
    // decode slots in behind the same expression with a per-partition
    // codec.
    Q(
      "mm_decode_meta",
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'jpeg' END AS format,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 54
        |       ELSE 112 + doc_id % 17 END AS BIGINT) AS size_bytes,
        |  CAST(doc_id % 240 + 16 AS BIGINT) AS width,
        |  CAST((doc_id * 7) % 240 + 16 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.plans.{ImageMeta, ImageMetaExpr}
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
      T.documents(s, d)
        .select(col("doc_id")).as[Long]
        .mapPartitions { ids => // per-partition init point for a real codec
          ids.map { id =>
            val w = (id % 240 + 16).toInt
            val h = (id * 7 % 240 + 16).toInt
            MediaBlob(id, (id % 3) match {
              case 0 => ImageMeta.pngFixture(w, h)
              case 1 => ImageMeta.bmpFixture(w, h)
              case _ => ImageMeta.jpegFixture(w, h, (id % 17).toInt)
            })
          }
        }
        .toDF()
        .select(col("doc_id"),
          toCol(ImageMetaExpr(toExpr(col("media")))).as("m"),
          length(col("media")).cast(LongType).as("size_bytes"))
        .select(col("doc_id"), col("m.format").as("format"),
          col("size_bytes"), col("m.width").as("width"),
          col("m.height").as("height"))
        .orderBy(col("doc_id"))
    },

    // Audio decode: the WAV/RIFF leg of the multimodal family, same
    // real-header-codec discipline as mm_decode_meta — every document
    // carries a byte-faithful 44-byte canonical PCM header
    // (graft.plans.AudioMeta.wavFixture) whose rate/channels/sample-count
    // derive from doc_id, and the codegen'd `audio_meta` expression parses
    // the actual little-endian fields back out (duration in exact integer
    // µs). Oracle pins generator∘parser = identity; a parser misreading
    // any offset goes red. Narrow map, no shuffle, no UDF.
    Q(
      "mm_audio_meta",
      """SELECT doc_id,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        |  CAST(CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |       WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS BIGINT) AS sample_rate,
        |  CAST(16 AS BIGINT) AS bits,
        |  CAST(doc_id % 1000 + 100 AS BIGINT) AS n_samples,
        |  CAST((doc_id % 1000 + 100) * 1000000
        |    // (CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |        WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END) AS BIGINT) AS duration_us
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.plans.{AudioMeta, AudioMetaExpr}
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
      val rates = Array(8000, 16000, 22050, 44100, 48000)
      T.documents(s, d)
        .select(col("doc_id")).as[Long]
        .mapPartitions { ids => // per-partition init point for a real codec
          ids.map { id =>
            MediaBlob(id, AudioMeta.wavFixture(
              rates((id % 5).toInt), (id % 2 + 1).toInt, 16,
              (id % 1000 + 100).toInt))
          }
        }
        .toDF()
        .select(col("doc_id"), toCol(AudioMetaExpr(toExpr(col("media")))).as("m"))
        .select(col("doc_id"), col("m.channels").as("channels"),
          col("m.sample_rate").as("sample_rate"), col("m.bits").as("bits"),
          col("m.n_samples").as("n_samples"),
          col("m.duration_us").as("duration_us"))
        .orderBy(col("doc_id"))
    },

    // Video decode: MP4/ISO-BMFF box-tree walking (graft.plans.VideoMeta)
    // completes the image/audio/video metadata trio. Fixtures alternate a
    // plain layout with one carrying a leading `free` padding box — the
    // parser must WALK the length-prefixed box sequence to moov/mvhd, not
    // peek fixed offsets, and the oracle's identity check proves it.
    Q(
      "mm_video_meta",
      """SELECT doc_id,
        |  'isom' AS brand,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
        |       WHEN 2 THEN 24000 ELSE 90000 END AS BIGINT) AS timescale,
        |  CAST((doc_id * 37) % 100000 + 1000 AS BIGINT) AS duration_ticks,
        |  CAST(((doc_id * 37) % 100000 + 1000) * 1000000
        |    // (CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
        |        WHEN 2 THEN 24000 ELSE 90000 END) AS BIGINT) AS duration_us
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.plans.{VideoMeta, VideoMetaExpr}
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
      val scales = Array(600, 1000, 24000, 90000)
      T.documents(s, d)
        .select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            MediaBlob(id, VideoMeta.mp4Fixture(
              scales((id % 4).toInt), ((id * 37) % 100000 + 1000).toInt,
              freePad = if (id % 2 == 0) 0 else 16))
          }
        }
        .toDF()
        .select(col("doc_id"), toCol(VideoMetaExpr(toExpr(col("media")))).as("m"))
        .select(col("doc_id"), col("m.brand").as("brand"),
          col("m.timescale").as("timescale"),
          col("m.duration_ticks").as("duration_ticks"),
          col("m.duration_us").as("duration_us"))
        .orderBy(col("doc_id"))
    },

    // Resize planning: fit each image into a 64×64 box preserving aspect
    // ratio — pure metadata math (the byte-level resample is the codec
    // stub's job); one deterministic IEEE expression tree per row.
    Q(
      "mm_resize_plan",
      s"""SELECT doc_id, width, height,
         |  GREATEST(1, CAST(floor(width * least(64.0/width, 64.0/height)) AS BIGINT)) AS out_w,
         |  GREATEST(1, CAST(floor(height * least(64.0/width, 64.0/height)) AS BIGINT)) AS out_h
         |FROM (SELECT doc_id, $FakeDimsSql FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val media = T.documents(s, d).withColumn("media", col("text").cast(BinaryType))
      val (w, h, _) = fakeDims(md5(col("media")), length(col("media")))
      val dims = media.select(col("doc_id"), w, h)
      val scale = least(lit(64.0) / col("width"), lit(64.0) / col("height"))
      dims.select(col("doc_id"), col("width"), col("height"),
          greatest(lit(1L), floor(col("width") * scale).cast(LongType)).as("out_w"),
          greatest(lit(1L), floor(col("height") * scale).cast(LongType)).as("out_h"))
        .orderBy(col("doc_id"))
    },

    // Frame sampling: every 10th frame index of the fake-decoded stream,
    // with a content key per sampled frame — the explode stays inside the
    // scan stage (narrow fan-out, no shuffle).
    Q(
      "mm_frame_sample",
      s"""SELECT doc_id, f AS frame_idx,
         |  substr(md5(CAST(doc_id AS VARCHAR)||':'||CAST(f AS VARCHAR)), 1, 8) AS frame_key
         |FROM (SELECT doc_id, unnest(range(0, n_frames, 10)) AS f
         |      FROM (SELECT doc_id, $FakeDimsSql FROM documents))
         |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      val media = T.documents(s, d).withColumn("media", col("text").cast(BinaryType))
      val (w, h, nf) = fakeDims(md5(col("media")), length(col("media")))
      media.select(col("doc_id"), w, h, nf)
        .select(col("doc_id"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(10L))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          substring(md5(concat(col("doc_id").cast(StringType), lit(":"),
            col("frame_idx").cast(StringType))), 1, 8).as("frame_key"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // Feature extraction through REAL per-partition batch plumbing
    // (Dataset.mapPartitions = the Scala analog of mapInPandas): the
    // extractor is initialized once per partition and streams the
    // partition's rows through it; the stub emits md5-derived ints whose
    // values the oracle reproduces declaratively.
    Q(
      "mm_feature_extract",
      """SELECT doc_id,
        |  array_to_string(list_transform(range(0,4),
        |    i -> CAST('0x'||substr(md5(text), CAST(1+4*i AS INTEGER), 4) AS BIGINT)), ',') AS features
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      T.documents(s, d)
        .select(col("doc_id"), col("text")).as[MediaIn]
        .mapPartitions { rows =>
          // per-partition init (a real codec/model would load here, once)
          rows.map(r => MediaFeat(r.doc_id, md5Features(
            r.text.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
        }
        .toDF()
        .select(col("doc_id"),
          array_join(col("features").cast("array<string>"), ",").as("features"))
        .orderBy(col("doc_id"))
    },

    // Perceptual-hash IMAGE DEDUP (round 12) — the multimodal leg of the
    // dedup family: every document carries a byte-faithful 16×16 24-bpp
    // BMP (real headers, real bottom-up BGR pixel rows — see
    // graft.plans.Phash), the codegen'd `phash16` expression parses the
    // ACTUAL bytes back (offset/stride/row-order from the header, not
    // assumed) and emits the 63-bit DCT-sign perceptual hash, and pairs
    // within hamming ≤ 3 are discovered by 4×16-bit pigeonhole banding
    // (the same family dd_simhash re-banded onto in round 15, 4×15 over
    // its 60 hash bits): ≤3 flipped bits cannot touch all 4 bands, so
    // the band-collision join is a COMPLETE candidate generator at that
    // threshold while never going all-pairs (inter-cluster hashes measure
    // hamming ≥ ~19, so the verify filter kills band noise). The fixture's
    // gray frames are md5-derived per 4-doc cluster with sparse
    // per-variant perturbation — near-dup structure by construction — and
    // the oracle recomputes gray → DCT (the SAME integer basis literals,
    // Phash.CtSql) → hash → bands → verify from doc_id alone, pinning
    // generator∘parser∘hash = identity: a misread stride or row order
    // goes red. Plan: one narrow fixture+hash map (localCheckpointed —
    // three consumers), a keyed band join, one verify join; no shuffle
    // carries pixel payloads.
    Q(
      "mm_phash_dedup",
      s"""WITH $PhashSqlCtes,
           |pb AS (SELECT doc_id, ph, tt.t,
           |         (ph // CAST(pow(2, 16*tt.t) AS BIGINT)) % 65536 AS band
           |       FROM phh CROSS JOIN (SELECT unnest([0,1,2,3]) AS t) tt),
           |pcand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |          FROM pb a JOIN pb b ON a.t = b.t AND a.band = b.band
           |            AND a.doc_id < b.doc_id)
           |SELECT c.doc_a, c.doc_b, bit_count(xor(ha.ph, hb.ph)) AS hamming
           |FROM pcand c JOIN phh ha ON ha.doc_id = c.doc_a
           |JOIN phh hb ON hb.doc_id = c.doc_b
           |WHERE bit_count(xor(ha.ph, hb.ph)) <= 3
           |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.plans.{Phash, PhashExpr}
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
      val hashed = T.documents(s, d)
        .select(col("doc_id")).as[Long]
        .mapPartitions { ids => // per-partition init point for a real codec
          ids.map(id => MediaBlob(id, Phash.bmpPixelFixture(id)))
        }
        .toDF()
        .select(col("doc_id"), toCol(PhashExpr(toExpr(col("media")))).as("ph"))
        .localCheckpoint(eager = true)
      val bands = hashed
        .select(col("doc_id"), col("ph"), explode(expr("sequence(0, 3)")).as("t"))
        .select(col("doc_id"), col("t"),
          expr("shiftright(ph, cast(16*t as int)) % 65536").as("band"))
      val cand = bands.select(col("doc_id").as("doc_a"), col("t"), col("band"))
        .join(bands.select(col("doc_id").as("doc_b"), col("t"), col("band")),
          Seq("t", "band"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
        .dropDuplicates(Seq("doc_a", "doc_b"))
      cand
        .join(hashed.select(col("doc_id").as("doc_a"), col("ph").as("ha")), Seq("doc_a"))
        .join(hashed.select(col("doc_id").as("doc_b"), col("ph").as("hb")), Seq("doc_b"))
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast(LongType))
        .filter(col("hamming") <= 3)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Incremental IMAGE dedup — the production probe shape for the third
    // modality (text: dd_incremental_lsh, vectors: dd_incremental_embed):
    // a NEW image batch (the deterministic top-10%-of-doc_id slice) is
    // hashed and probed against the existing corpus's slim (img_id, ph)
    // index WITHOUT re-pairing the corpus — bands derived row-locally on
    // both sides, batch bands broadcast, corpus unshuffled through the
    // band join, first-band-match row-local dedup, exact bit_count
    // verify (graft.operators.ImageDup — the same index/probe API the
    // streaming imageDupGate seals runs with). Verdict per new image:
    // distinct band-collision candidates, best hamming (64 = none), dup
    // iff ≤ 3. The oracle replays hash → cut → band join → verdict from
    // doc_id alone.
    Q(
      "dd_incremental_phash",
      s"""WITH $PhashSqlCtes,
         |icut AS (SELECT (max(doc_id)*9)//10 AS cutv FROM documents),
         |ib AS (SELECT doc_id, ph, tt.t,
         |         (ph // CAST(pow(2, 16*tt.t) AS BIGINT)) % 65536 AS band
         |       FROM phh CROSS JOIN (SELECT unnest([0,1,2,3]) AS t) tt),
         |icand AS (
         |  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
         |  FROM ib n JOIN ib c ON n.t = c.t AND n.band = c.band, icut
         |  WHERE n.doc_id >= icut.cutv AND c.doc_id < icut.cutv),
         |iham AS (
         |  SELECT x.new_id, bit_count(xor(a.ph, b.ph)) AS hamming
         |  FROM icand x JOIN phh a ON a.doc_id = x.new_id
         |  JOIN phh b ON b.doc_id = x.corpus_id),
         |iper AS (SELECT new_id, count(*) AS n_cand, min(hamming) AS best_hamming
         |         FROM iham GROUP BY new_id)
         |SELECT n.doc_id AS img_id, coalesce(p.n_cand, 0) AS n_cand,
         |  CAST(coalesce(p.best_hamming, 64) AS BIGINT) AS best_hamming,
         |  coalesce(p.best_hamming, 64) <= 3 AS is_dup
         |FROM (SELECT ph.doc_id FROM phh ph, icut WHERE ph.doc_id >= icut.cutv) n
         |LEFT JOIN iper p ON p.new_id = n.doc_id
         |ORDER BY n.doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.plans.Phash
      val withMedia = T.documents(s, d)
        .select(col("doc_id")).as[Long]
        .mapPartitions { ids => // per-partition init point for a real codec
          ids.map(id => MediaBlob(id, Phash.bmpPixelFixture(id)))
        }
        .toDF()
        .withColumnRenamed("doc_id", "img_id")
      val idx = ImageDup.imageIndex(withMedia)
      val cut = idx.agg(expr("(max(img_id)*9) div 10").as("cut"))
      val withCut = idx.crossJoin(broadcast(cut)).localCheckpoint(eager = true)
      val corpus = withCut.filter(col("img_id") < col("cut"))
        .select(col("img_id"), col("ph"))
      val batch = withCut.filter(col("img_id") >= col("cut"))
        .select(col("img_id"), col("ph"))
      ImageDup.probeImageIndex(batch, corpus)
        .orderBy(col("img_id"))
    },

    // "More like this IMAGE" serving (the mm mirror of dd_sim_topk): for
    // every image, its top-3 perceptual neighbors by hamming among the
    // band-collision candidates (both orientations of the pigeonhole
    // graph — a query image collides with neighbors whichever side
    // indexed first), ranked (hamming ASC, neighbor id ASC). Candidates
    // stay band-bounded — never all-pairs — and the per-image top-3
    // survives via BoundedTopK partial aggregation, ≤3 entries per key
    // across the shuffle (no rank window over the pair stream). The
    // hamming order key packs (hamming, n_id) into one Long (hamming ≤ 64
    // → 7 bits; ids < 2^48) so the aggregator's lexicographic tie-break
    // IS the output order.
    Q(
      "mm_phash_rank",
      s"""WITH $PhashSqlCtes,
         |rb AS (SELECT doc_id, ph, tt.t,
         |         (ph // CAST(pow(2, 16*tt.t) AS BIGINT)) % 65536 AS band
         |       FROM phh CROSS JOIN (SELECT unnest([0,1,2,3]) AS t) tt),
         |rcand AS (SELECT DISTINCT a.doc_id AS img_id, b.doc_id AS n_id
         |          FROM rb a JOIN rb b ON a.t = b.t AND a.band = b.band
         |            AND a.doc_id <> b.doc_id),
         |rham AS (
         |  SELECT c.img_id, c.n_id,
         |    CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
         |  FROM rcand c JOIN phh a ON a.doc_id = c.img_id
         |  JOIN phh b ON b.doc_id = c.n_id)
         |SELECT img_id, n_id, hamming, rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY img_id ORDER BY hamming, n_id) AS rnk
         |  FROM rham)
         |WHERE rnk <= 3 ORDER BY img_id, rnk""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.plans.Phash
      val idx = ImageDup.imageIndex(
        T.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions(ids => ids.map(id => MediaBlob(id, Phash.bmpPixelFixture(id))))
          .toDF()
          .withColumnRenamed("doc_id", "img_id"))
        .localCheckpoint(eager = true)
      val bands = idx
        .select(col("img_id"), col("ph"), explode(expr("sequence(0, 3)")).as("t"))
        .select(col("img_id"), col("ph"), col("t"),
          expr("shiftright(ph, cast(16*t as int)) % 65536").as("band"))
      val cand = bands.select(col("img_id"), col("t"), col("band"), col("ph").as("pa"))
        .join(bands.select(col("img_id").as("n_id"), col("t"), col("band"),
          col("ph").as("pb")), Seq("t", "band"))
        .filter(col("img_id") =!= col("n_id"))
        .select(col("img_id"), col("n_id"),
          bit_count(col("pa").bitwiseXOR(col("pb"))).cast(LongType).as("hamming"))
        .dropDuplicates(Seq("img_id", "n_id"))
      // one packed Long orders (hamming, n_id) lexicographically inside
      // the aggregator: hamming ≤ 64 fits high bits, ids ≪ 2^48 low bits
      val top3 = udaf(graft.functions.BoundedTopK[Long](3))
      cand.groupBy(col("img_id"))
        .agg(top3(expr("hamming * 281474976710656L + n_id"), col("n_id")).as("top"))
        .select(col("img_id"), posexplode(col("top")).as(Seq("r0", "t")))
        .select(col("img_id"), col("t._2").as("n_id"),
          expr("t._1 div 281474976710656L").as("hamming"),
          (col("r0") + 1).cast(LongType).as("rnk"))
        .orderBy(col("img_id"), col("rnk"))
    }
  )
}
