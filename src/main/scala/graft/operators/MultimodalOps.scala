package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus a partition-wise featurization pass.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic stub ([[fakeDecode]]) — but the Spark-side plumbing is
  * real: binary column construction, a typed metadata struct, and
  * `mapPartitions` featurization that processes rows batch-wise per
  * partition exactly the way a Pandas-UDF/Arrow batch would, with no
  * driver-side collection anywhere.
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic stand-in for a media decoder: "decodes" a payload into a
    * 16-bin byte-value histogram, L1-normalized. A real deployment swaps
    * this single function for an actual codec; everything around it —
    * schema, partitioning, batch shape — is unchanged.
    */
  def fakeDecode(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % 16) += 1.0
      i += 1
    }
    val total = math.max(payload.length.toDouble, 1.0)
    var j = 0
    while (j < 16) { hist(j) /= total; j += 1 }
    hist
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)
  ))

  /** Deterministic stand-in for a media RESIZE: stride-4 byte
    * down-sampling. A real deployment swaps this for an image scaler; the
    * partitioned pass, binary-in/binary-out shape, and downstream schema
    * are what the pipeline actually exercises.
    */
  def fakeResize(payload: Array[Byte], stride: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = payload(i * stride); i += 1 }
    out
  }

  val resizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("resized", BinaryType, nullable = false)
  ))

  /** documents → (doc_id, media binary, metadata struct). The binary payload
    * is the UTF-8 encoding of the text (the only bytes available offline);
    * a production pipeline reads e.g. image bytes from object storage.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    graft.Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        lit("text/plain").as("mime"),
        col("source").as("origin")).as("meta"))

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Metadata extraction over the binary column — oracle-checkable since
    // byte length and sha256 are engine-independent.
    ("multimodal_meta",
      (s: SparkSession, d: String) =>
        mediaTable(s, d).select(
          col("doc_id"),
          col("meta.n_bytes").as("n_bytes"),
          sha2(col("media"), 256).as("sha256"),
          col("meta.origin").as("origin"))
          .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |       sha256(text) AS sha256,
          |       source AS origin
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // Resize through the stub scaler: binary-in/binary-out mapPartitions
    // pass (the image-codec-shaped hole in this container), downstream
    // checksum + length as the differential. DuckDB replays the stride-4
    // byte sampling on the ASCII text with a filtered list comprehension.
    ("multimodal_resize",
      (s: SparkSession, d: String) => {
        val resized = mediaTable(s, d)
          .select(col("doc_id"), col("media"), col("meta.n_bytes").as("nb"))
          .mapPartitions { rows =>
            rows.map { r =>
              Row(r.getAs[Long]("doc_id"), r.getAs[Long]("nb"),
                fakeResize(r.getAs[Array[Byte]]("media"), 4))
            }
          }(org.apache.spark.sql.Encoders.row(resizeSchema))
        resized.select(
          col("doc_id"), col("n_bytes"),
          octet_length(col("resized")).cast("long").as("resized_n"),
          md5(col("resized")).as("resized_md5"))
          .orderBy("doc_id")
      },
      Some(
        """SELECT doc_id,
          |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |       CAST(len([1 FOR i IN range(1, len(text)+1) IF (i-1)%4 = 0]) AS BIGINT) AS resized_n,
          |       md5(array_to_string([text[i] FOR i IN range(1, len(text)+1) IF (i-1)%4 = 0], '')) AS resized_md5
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame sampling over an opaque video-like payload: fixed 64-byte
    // "frames", every 4th sampled — entirely columnar (sequence/explode +
    // binary substring + md5), no UDF and no decoder needed, which is the
    // point: at 100 TB the frame-index fan-out and slice are codegen'd
    // and the (stubbed-out) per-frame decode is the ONLY black box. The
    // corpus is ASCII so DuckDB replays the byte slices on the text.
    // Scale bound: sequence() materializes the frame-index array per row
    // (~n_bytes/64 longs) — fine across the whole regime a single binary
    // cell can legally occupy (Spark caps a cell at 2 GB → ≤32M indices);
    // payloads beyond that must arrive pre-chunked as multiple rows, at
    // which point the fan-out is per-chunk and stays bounded.
    ("multimodal_frame_sample",
      (s: SparkSession, d: String) =>
        mediaTable(s, d)
          .select(col("doc_id"), col("media"), col("meta.n_bytes").as("nb"))
          // empty payload ⇒ no frames. Without the guard, sequence(0, -1)
          // silently yields [0, -1] (Spark defaults to step -1 when
          // start > stop) and would emit a phantom frame the oracle's
          // range(0, 0) does not.
          .filter(col("nb") > 0)
          .select(col("doc_id"), col("media"),
            explode(sequence(lit(0L),
              ceil(col("nb") / 64.0).cast("long") - 1)).as("frame_idx"))
          .filter(col("frame_idx") % 4 === 0)
          .select(col("doc_id"), col("frame_idx"),
            md5(expr("substring(media, frame_idx * 64 + 1, 64)")).as("frame_md5"))
          .orderBy("doc_id", "frame_idx"),
      Some(
        """WITH f AS (
          |  SELECT doc_id, text,
          |         CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS nf
          |  FROM documents
          |), idx AS (
          |  SELECT doc_id, text, i AS frame_idx
          |  FROM f, UNNEST(range(0, nf)) AS t(i)
          |  WHERE i % 4 = 0
          |)
          |SELECT doc_id, frame_idx,
          |       md5(substring(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_md5
          |FROM idx ORDER BY doc_id, frame_idx""".stripMargin)),

    // Partition-wise featurization through the stub decoder. The stub's
    // 16-bin byte histogram is plain arithmetic, so DuckDB can replay it in
    // SQL (the corpus is ASCII → unicode(char) ≡ byte); MultimodalSpec
    // additionally pins values.
    ("multimodal_features",
      (s: SparkSession, d: String) => {
        val media = mediaTable(s, d)
        // empty payloads must be ABSENT, matching the oracle's inner
        // join on the per-bin histogram (no characters → no h rows →
        // doc dropped); unguarded, an empty doc emitted
        // (doc_id, 0, NULL, 0.0) on the Spark side — the same
        // empty-payload parity rule audio_energy and frame_sample pin
        val feats = media
          .filter(col("meta.n_bytes") > 0)
          .select(col("doc_id"), col("media"), col("meta.n_bytes").as("nb"))
          .mapPartitions { rows =>
            rows.map { r =>
              val payload = r.getAs[Array[Byte]]("media")
              Row(r.getAs[Long]("doc_id"), r.getAs[Long]("nb"), fakeDecode(payload))
            }
          }(org.apache.spark.sql.Encoders.row(featureSchema))
        // feat_l2sq = Σ(c_b/n)² is summation-order-sensitive in doubles (a
        // 16-term sum can land on a 4-decimal rounding tie differently per
        // engine — seen at sf0.1). Recover the EXACT integer bin counts
        // (c = round(x·n), exact since x = c/n), sum c² as integers, and
        // divide once — one identical double op on identical integers in
        // both engines, so the rounded result is deterministic.
        feats
          .select(col("doc_id"), col("n_bytes"),
            round(
              aggregate(col("features"), lit(0L), (acc, x) => {
                val c = round(x * col("n_bytes")).cast("long")
                acc + c * c
              }).cast("double") /
                (col("n_bytes") * col("n_bytes")).cast("double"),
              4).as("feat_l2sq"),
            round(element_at(col("features"), 1), 4).as("bin0"))
          .orderBy("doc_id")
      },
      Some(
        """WITH b AS (
          |  SELECT doc_id, unicode(x) % 16 AS bin
          |  FROM (SELECT doc_id, string_split(text, '') AS cs FROM documents),
          |       UNNEST(cs) AS t(x)
          |), n AS (
          |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |         CAST(length(text) AS DOUBLE) AS n
          |  FROM documents
          |), h AS (
          |  SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
          |)
          |SELECT n.doc_id, n.n_bytes,
          |       round(CAST(sum(h.c * h.c) AS DOUBLE)
          |             / CAST(n.n_bytes * n.n_bytes AS DOUBLE), 4) AS feat_l2sq,
          |       round(coalesce(sum(CASE WHEN h.bin = 0 THEN h.c END), 0) / n.n, 4) AS bin0
          |FROM n JOIN h ON h.doc_id = n.doc_id
          |GROUP BY n.doc_id, n.n_bytes, n.n
          |ORDER BY n.doc_id""".stripMargin)),

    // Audio-shaped windowed energy: the payload read as 8-bit "PCM",
    // windowed into fixed 32-sample frames, per-frame energy
    // Σ (sample − 96)² — the VAD/loudness pre-pass an audio curation
    // pipeline runs before the (stubbed) codec. Entirely columnar
    // (sequence/explode + per-frame higher-order aggregate over a
    // MATERIALIZED frame column — the shingles lambda-rebind trap), and
    // ALL-INTEGER, so the energies, the argmax frame (ties → lowest
    // index, via the packed struct max) and the totals are cross-engine
    // exact.
    ("multimodal_audio_energy",
      (s: SparkSession, d: String) =>
        graft.Tables.documents(s, d)
          .select(col("doc_id"), col("text"), length(col("text")).as("n"))
          // empty payloads have no frames and must be ABSENT on both
          // sides: the unguarded Spark framing fabricated a phantom
          // frame (sequence(0, (0-1)/32) = [0]) for text = '', and the
          // oracle's range(0, (length-1)//32 + 1) does too (DuckDB //
          // truncates toward zero, so (-1)//32 = 0 → range(0,1) = one
          // frame) — both sides carry an explicit length > 0 guard
          .filter(col("n") > 0)
          .withColumn("f",
            explode(sequence(lit(0), ((col("n") - 1) / lit(32)).cast("int"))))
          .withColumn("fr", expr("substring(text, f*32 + 1, 32)"))
          .withColumn("energy", expr(
            "aggregate(transform(sequence(1, length(fr)), " +
              "j -> CAST(ascii(substring(fr, j, 1)) - 96 AS BIGINT)), " +
              "0L, (a, x) -> a + x*x)"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_frames"),
            sum("energy").as("total_energy"),
            max(struct(col("energy"), (-col("f")).cast("long").as("nf")))
              .as("best"))
          .select(col("doc_id"), col("n_frames"), col("total_energy"),
            col("best.energy").as("max_energy"),
            (-col("best.nf")).as("loudest_f"))
          .orderBy("doc_id"),
      Some(
        """WITH fr AS (
          |  -- length > 0: (-1)//32 truncates to 0 in DuckDB, so an empty
          |  -- text would otherwise fabricate one phantom frame whose NULL
          |  -- energy only vanished by luck of the final equality join
          |  SELECT doc_id, CAST(r.i AS BIGINT) AS f,
          |         substr(text, CAST(r.i*32 + 1 AS INT), 32) AS s
          |  FROM documents, UNNEST(range(0, (length(text)-1)//32 + 1)) r(i)
          |  WHERE length(text) > 0
          |), en AS (
          |  SELECT doc_id, f,
          |         CAST(list_sum([(ord(s[j]) - 96) * (ord(s[j]) - 96)
          |                        FOR j IN range(1, len(s)+1)]) AS BIGINT) AS energy
          |  FROM fr
          |), agg AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
          |         CAST(sum(energy) AS BIGINT) AS total_energy,
          |         CAST(max(energy) AS BIGINT) AS max_energy
          |  FROM en GROUP BY 1
          |)
          |SELECT a.doc_id, a.n_frames, a.total_energy, a.max_energy,
          |       min(e.f) AS loudest_f
          |FROM agg a JOIN en e
          |  ON e.doc_id = a.doc_id AND e.energy = a.max_energy
          |GROUP BY 1, 2, 3, 4 ORDER BY a.doc_id""".stripMargin))
  )
}
