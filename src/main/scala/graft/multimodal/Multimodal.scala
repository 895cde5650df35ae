package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (beyond-reference scope).
  *
  * Design: media assets are opaque `binary` columns with typed metadata
  * structs riding alongside — the pattern that scales to 100 TB because the
  * bytes stay columnar in parquet, are never collected to the driver, and
  * partition like any other column.
  *
  * The actual codec work (JPEG decode, audio resample, video frame
  * extraction) needs native libraries that are NOT in this container, so
  * the decode kernels below are clearly-marked DETERMINISTIC STUBS. The
  * Spark-side plumbing — schemas, per-partition decoder lifecycle,
  * mapPartitions batch shape, column contracts — is real and tested; swap
  * `StubCodec` for a real one (javacv/libvips JNI) without touching the
  * dataflow.
  */
object Multimodal {

  /** Metadata contract for decoded images. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
  ))

  /** ============ STUB CODEC ============
    * Deterministic fake decoder: derives plausible metadata and features
    * from a hash of the bytes. Replace with a real codec for production;
    * everything downstream is agnostic to the swap.
    */
  object StubCodec {
    def imageMeta(bytes: Array[Byte]): (Int, Int, Int, String) = {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 64 + math.abs(h % 1024)
      val ht = 64 + math.abs((h / 7) % 1024)
      val c = if (h % 5 == 0) 1 else 3
      (w, ht, c, if (h % 2 == 0) "jpeg" else "png")
    }

    /** Fake embedding: `dim` floats derived deterministically from bytes. */
    def featurize(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      var j = 0
      while (j < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(j) = ((h & 0xffffffL).toFloat / 0x800000L) - 1.0f
        j += 1
      }
      out
    }

    /** Fake frame sampler: returns `n` byte slices standing in for frames. */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty) return Seq.empty
      (0 until n).map { i =>
        val start = (bytes.length.toLong * i / n).toInt
        val end = math.min(bytes.length, start + math.max(1, bytes.length / n))
        java.util.Arrays.copyOfRange(bytes, start, end)
      }
    }
  }

  /** Shared mapPartitions scaffold: append ONE column derived from a
    * binary column. The per-partition codec lifecycle lives here, once:
    * a real decoder initializes per partition (the expensive part with
    * JNI codecs) and streams the rows — the Scala analogue of the
    * mapInPandas iterator-of-batches shape. Schema declared up front;
    * null bytes → null output.
    */
  private def withBinaryDerived(df: DataFrame, binaryCol: String, outField: StructField)(
      f: (StubCodec.type, Array[Byte]) => Any): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ outField)
    val binIdx = df.schema.fieldIndex(binaryCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // Real codec: initialize native decoder here, once per partition.
      val codec = StubCodec
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) null else f(codec, bytes)))
      }
    }(enc)
  }

  /** Attach decoded image metadata to a binary column. */
  def withImageMeta(df: DataFrame, binaryCol: String, outCol: String = "image_meta"): DataFrame =
    withBinaryDerived(df, binaryCol, StructField(outCol, imageMetaSchema, nullable = true)) {
      (codec, bytes) =>
        val (w, h, c, f) = codec.imageMeta(bytes)
        Row(w, h, c, f)
    }

  /** Attach a deterministic feature vector (embedding stand-in) to a
    * binary column. Output column is `array<float>` ready for the
    * graft.similarity ANN operators.
    */
  def withFeatures(df: DataFrame, binaryCol: String, dim: Int = 64, outCol: String = "features"): DataFrame =
    withBinaryDerived(df, binaryCol,
      StructField(outCol, ArrayType(FloatType, containsNull = false), nullable = true)) {
      (codec, bytes) => codec.featurize(bytes, dim)
    }

  /** Resize a binary image column to a target "resolution": the stub
    * scales the payload to ceil(len · target / max(dim)) bytes —
    * deterministic integer arithmetic standing in for a real resampler.
    */
  def withResized(
      df: DataFrame,
      binaryCol: String,
      targetDim: Int,
      outCol: String = "resized",
  ): DataFrame = {
    require(targetDim > 0)
    withBinaryDerived(df, binaryCol, StructField(outCol, BinaryType, nullable = true)) {
      (codec, bytes) =>
        val (w, h, _, _) = codec.imageMeta(bytes)
        val maxDim = math.max(w, h)
        if (maxDim <= targetDim) bytes
        else {
          val n = math.max(1, ((bytes.length.toLong * targetDim + maxDim - 1) / maxDim).toInt)
          java.util.Arrays.copyOfRange(bytes, 0, math.min(bytes.length, n))
        }
    }
  }

  /** Explode a video binary column into sampled frame rows
    * (one row per frame, frame index + frame bytes).
    */
  def explodeFrames(df: DataFrame, binaryCol: String, framesPerVideo: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true),
    ))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val codec = StubCodec
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else codec.sampleFrames(bytes, framesPerVideo).iterator.zipWithIndex.map {
          case (frame, i) => Row.fromSeq(r.toSeq ++ Seq(i, frame))
        }
      }
    }(enc)
  }

  /** Build a media table from the documents test table: text bytes stand
    * in for encoded media (the plumbing under test, not the codec).
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    graft.core.Readers
      .table(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("content"),
        col("source"),
      )
  }
}
