package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.kernels.ImageKernels
import graft.model.SliceRecord

/** M3 — full pipeline parity: the reference's Beam job
  * (`/root/reference/dataflow_pipeline.py:60-141`) as ONE Spark program:
  * scan → per-image decode/window/enhance/stats (fused in a single
  * mapPartitions, as the reference fuses them inside `DoFn.process`) →
  * slice-record table → append sink.
  *
  * The container has no DICOM codec (and the driver testdata has no DICOM
  * files), so decode is a STUB: a deterministic synthetic pixel array +
  * tag bag derived from the input id. The Spark-side plumbing — schema,
  * per-partition setup, windowing/enhance/stats math, ''→NULL semantics,
  * drop-on-failure flatMap — is real and matches the reference line-by-line.
  */
object SlicePipeline {

  /** Stand-in for a decoded DICOM: pixel array + tag map. Tags are absent
    * with deterministic probability to exercise the NULL paths
    * (`dataflow_pipeline.py:90-101`). */
  case class DecodedImage(
      fileName: String,
      path: String,
      h: Int, w: Int,
      pixels: Array[Double],
      tags: Map[String, String])

  /** STUB decode (`pydicom.dcmread` equivalent, `dataflow_pipeline.py:72-73`).
    * Deterministic fake: pixels from a hash-gradient; every 7th image lacks
    * window tags (→ min-max fallback), every 11th lacks PatientID (→ NULL
    * hash), every 13th has a MultiValue window center "[c, c+10]" (→ first
    * element, `dataflow_pipeline.py:25-26`). */
  def stubDecode(id: Long, h: Int = 32, w: Int = 32): DecodedImage = {
    val px = Array.tabulate(h * w) { i =>
      val y = i / w; val x = i % w
      ((id * 131 + y * 17 + x * 7) % 4096).toDouble // 12-bit-ish raw range
    }
    val base = Map(
      "StudyInstanceUID" -> s"study_${id % 10}",
      "SeriesInstanceUID" -> s"series_${id % 25}",
      "SOPInstanceUID" -> s"sop_$id",
      "Modality" -> (if (id % 3 == 0) "CT" else "MR"))
    val withPid = if (id % 11 == 0) base else base + ("PatientID" -> s"patient_${id % 50}")
    val withWin =
      if (id % 7 == 0) withPid
      else if (id % 13 == 0) withPid + ("WindowCenter" -> s"[${1000 + id % 500}, ${1010 + id % 500}]",
        "WindowWidth" -> s"[${400 + id % 200}, ${410 + id % 200}]")
      else withPid + ("WindowCenter" -> s"${1000 + id % 500}", "WindowWidth" -> s"${400 + id % 200}")
    DecodedImage(f"img_$id%06d.dcm", f"raw/img_$id%06d.dcm", h, w, px, withWin)
  }

  /** First element of a possibly MultiValue tag (`dataflow_pipeline.py:25-26`).
    * Accepts both the pydicom repr style `[a, b]` and the DICOM wire DS
    * multi-value `a\b`. */
  private def tagToDouble(v: String): Option[Double] = {
    val first =
      if (v.startsWith("[")) v.stripPrefix("[").split(",").head.trim
      else if (v.contains("\\")) v.split("\\\\").head.trim
      else v.trim
    try Some(first.toDouble) catch { case _: NumberFormatException => None }
  }

  /** The DoFn body (`dataflow_pipeline.py:68-110`), one image → 0..1 records:
    * windowing (D1) → CLAHE (D2) → Gaussian σ=0.5 (D3) → mean/std (E1/E2,
    * population std) → 15-field row with ''→NULL coercion and sha256[0:16]
    * patient hash. Encode failure (stub: never) drops the record (C3).
    */
  def processImage(img: DecodedImage, processedPrefix: String): Option[SliceRecord] = {
    val wc = img.tags.get("WindowCenter").flatMap(tagToDouble)
    val ww = img.tags.get("WindowWidth").flatMap(tagToDouble)
    val usedWindow = wc.isDefined && ww.exists(_ > 0)
    // window → _enhance_for_export (dataflow_pipeline.py:42-46): CLAHE, blur σ=0.5
    val enhanced = enhancedPixels(img)
    val n = enhanced.length.toDouble
    val mean = enhanced.map(_.toDouble).sum / n
    val variance = enhanced.map(v => (v - mean) * (v - mean)).sum / n // ddof=0
    val pid = img.tags.getOrElse("PatientID", "")
    val pidHash =
      if (pid.isEmpty) None
      else Some(java.security.MessageDigest.getInstance("SHA-256")
        .digest(pid.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16))
    def nn(tag: String): Option[String] = img.tags.get(tag).filter(_.nonEmpty)
    val stem = img.fileName.replaceAll("\\.[^.]*$", "")
    Some(SliceRecord(
      file_name = img.fileName,
      gcs_uri_raw = img.path,
      gcs_uri_processed = s"${processedPrefix.replaceAll("/+$", "")}/$stem.png",
      patient_id_hash = pidHash,
      study_uid = nn("StudyInstanceUID"),
      series_uid = nn("SeriesInstanceUID"),
      sop_instance_uid = nn("SOPInstanceUID"),
      modality = nn("Modality"),
      rows = Some(img.h.toLong),
      cols = Some(img.w.toLong),
      mean_intensity = Some(mean),
      std_intensity = Some(math.sqrt(variance)),
      window_center = if (usedWindow) wc else None,
      window_width = if (usedWindow) ww else None,
      processed_at = new java.sql.Timestamp(0L) // deterministic stand-in for D7 wall-clock
    ))
  }

  /** The whole pipeline: ids stand in for matched files (A1). One narrow
    * mapPartitions — no shuffle, exactly like the reference's fused ParDo
    * chain (SURVEY.md §3.1: "map-only in both systems").
    */
  def run(spark: SparkSession, nImages: Int, processedPrefix: String = "out/processed")
      : Dataset[SliceRecord] = {
    import spark.implicits._
    spark.range(nImages.toLong)
      .mapPartitions { it =>
        // per-partition setup ≙ DoFn.setup (dataflow_pipeline.py:65-66)
        it.flatMap(id => processImage(stubDecode(id), processedPrefix))
      }
  }

  /** Windowed+enhanced uint8 pixels for one image — the array the reference
    * PNG-encodes at `dataflow_pipeline.py:75-81`. */
  def enhancedPixels(img: DecodedImage): Array[Int] = {
    val wc = img.tags.get("WindowCenter").flatMap(tagToDouble)
    val ww = img.tags.get("WindowWidth").flatMap(tagToDouble)
    val windowed = ImageKernels.applyWindowing(img.pixels, wc, ww)
    val enhanced0 = ImageKernels.clahe(windowed, img.h, img.w)
    ImageKernels.gaussianBlur(enhanced0.map(_.toDouble), img.h, img.w, 0.5)
      .map(v => math.min(math.max(math.round(v).toInt, 0), 255))
  }

  /** D1-only slice of the pipeline in long form: stub decode → intensity
    * windowing (the kernel path, [[ImageKernels.applyWindowing]]) → one row
    * per pixel. Lets the driver gate the windowing half of the per-image
    * stats against a plain-SQL oracle; the CLAHE/blur halves stay
    * golden-tested in KernelsSpec (no closed-form SQL). */
  def windowedPixels(spark: SparkSession, nImages: Int): DataFrame = {
    import spark.implicits._
    spark.range(nImages.toLong)
      .mapPartitions { it =>
        it.flatMap { id =>
          val img = stubDecode(id)
          val wc = img.tags.get("WindowCenter").flatMap(tagToDouble)
          val ww = img.tags.get("WindowWidth").flatMap(tagToDouble)
          ImageKernels.applyWindowing(img.pixels, wc, ww)
            .iterator.map(v => (img.fileName, v))
        }
      }.toDF("file_name", "u8")
  }

  /** B1 + D8 — per-record binary object write: PNG-encode each processed
    * image (real codec, [[graft.kernels.Png]]) and write one file per
    * record at the derived URI (`dataflow_pipeline.py:78-85`). Encode
    * failure drops the record silently (C3, `:79-80`). Runs as
    * `foreachPartition` — the writer is the executor-side effect, exactly
    * the DoFn's shape; no data returns to the driver.
    */
  def writePngs(spark: SparkSession, nImages: Int, outDir: String): Unit = {
    new java.io.File(outDir).mkdirs()
    spark.range(nImages.toLong).toDF("id").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { row =>
          val img = stubDecode(row.getLong(0))
          graft.kernels.Png.encodeGray(enhancedPixels(img), img.h, img.w).foreach { bytes =>
            val stem = img.fileName.replaceAll("\\.[^.]*$", "")
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"$stem.png"), bytes)
          }
        }
    }
  }

  /** A1+A2 real-decode form: the same pipeline from actual DICOM files —
    * distributed `binaryFile` scan → [[graft.sources.Dicom.decode]] (pure
    * Scala explicit-VR-LE parser) → the identical DoFn body. Undecodable
    * files drop silently (C3). Output matches [[run]] field-for-field when
    * the files carry the same content (DicomSpec proves it). */
  def runFromDicomFiles(spark: SparkSession, dir: String,
      processedPrefix: String = "out/processed"): Dataset[SliceRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (path, bytes) =>
          graft.sources.Dicom.decode(bytes).flatMap { d =>
            val name = path.split('/').last
            processImage(DecodedImage(name, path, d.rows, d.cols, d.pixels, d.tags),
              processedPrefix)
          }
        }
      }
  }

  /** Write stub-equivalent DICOM fixture files (16-bit, little-endian;
    * every other file omits the preamble to exercise the force=True
    * fallback, and every third file writes its dataset in IMPLICIT VR LE
    * — the default transfer syntax `pydicom.dcmread(force=True)` accepts
    * — so the m3/b1 gates run both wire formats through one decode path,
    * including the headerless-implicit combination that exercises the
    * reader's VR sniffing). MultiValue tags are converted from the stub's
    * pydicom-repr form to wire-format `a\b`.
    *
    * Idempotent and concurrent-safe against a SHARED fixture dir: each file
    * is written to a per-writer temp name then ATOMIC_MOVE'd into place
    * (`Files.write` alone is not atomic — a concurrent scan could read a
    * truncated `.dcm` whose decode failure C3 silently drops, flaking the
    * gate), and a `_COMPLETE` marker written last short-circuits re-runs so
    * the m3 query's bench cost is scan+decode, not fixture generation.
    * Two JVMs racing past the marker check both write — atomically, with
    * identical deterministic content — so either interleaving is safe. */
  def writeDicomFixtures(spark: SparkSession, nImages: Int, dir: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // marker carries a format version: v2 = implicit-VR files present —
    // a dir written by an older build regenerates instead of silently
    // serving the single-format fixture set
    val marker = Paths.get(dir, s"_COMPLETE_${nImages}_v2")
    if (Files.exists(marker)) return
    new java.io.File(dir).mkdirs()
    spark.range(nImages.toLong).toDF("id").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { row =>
          val id = row.getLong(0)
          val img = stubDecode(id)
          val wireTags = img.tags.map { case (k, v) =>
            k -> (if (v.startsWith("["))
              v.stripPrefix("[").stripSuffix("]").split(",").map(_.trim).mkString("\\")
            else v)
          }
          val bytes = graft.sources.Dicom.encode(
            wireTags, img.h, img.w, img.pixels, withPreamble = id % 2 == 0,
            implicitDataset = id % 3 == 2)
          val tmp = Files.createTempFile(Paths.get(dir), s".${img.fileName}", ".tmp")
          Files.write(tmp, bytes)
          Files.move(tmp, Paths.get(dir, img.fileName),
            StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        }
    }
    val tmpMarker = Files.createTempFile(Paths.get(dir), "._COMPLETE", ".tmp")
    Files.move(tmpMarker, marker,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append-sink form (B2): `WRITE_APPEND` + create-if-needed ≙ parquet
    * append. */
  def runAndAppend(spark: SparkSession, nImages: Int, outPath: String): Unit =
    run(spark, nImages).write.mode("append").parquet(outPath)

  /** B2 from real files: decode a DICOM dir and append the slice records to
    * a parquet table (`WRITE_APPEND` + `CREATE_IF_NEEDED`,
    * `dataflow_pipeline.py:135-141`). Called twice against the same path it
    * must yield every record twice — append, never overwrite. */
  def appendFromDicomFiles(spark: SparkSession, dicomDir: String, outPath: String): Unit =
    runFromDicomFiles(spark, dicomDir).write.mode("append").parquet(outPath)

  /** B1 gate path — per-record binary write from REAL inputs: binaryFile
    * scan → [[graft.sources.Dicom.decode]] → intensity windowing → u8 →
    * real PNG encode → one file per record (atomic temp+rename), executor-
    * side like the DoFn (`dataflow_pipeline.py:75-85`). Undecodable inputs
    * drop silently (C3, `:79-80`).
    *
    * Windowing-ONLY pixels (no CLAHE/blur) keep the write→read round-trip
    * closed-form SQL-checkable — the driver's sink gate reads these PNGs
    * back and checks per-file pixel aggregates against the stub formula.
    * The full enhance chain's per-record write is [[writePngs]]
    * (kernel-golden-tested; CLAHE has no SQL form). */
  def writeWindowedPngs(spark: SparkSession, dicomDir: String, pngDir: String): Unit = {
    new java.io.File(pngDir).mkdirs()
    writePngBatch(spark.read.format("binaryFile").load(dicomDir), pngDir)
  }

  /** One micro-batch of the B1 sink: per-record windowed-u8 PNG writes
    * from `(path, content)` rows. IDEMPOTENT by construction — the target
    * name is derived from the input path and the bytes are a deterministic
    * function of the input, so a redelivered batch atomically re-writes
    * identical files ([[startStreamingPngSink]] relies on exactly this). */
  def writePngBatch(batch: DataFrame, pngDir: String): Unit = {
    import batch.sparkSession.implicits._
    batch.select(col("path"), col("content")).as[(String, Array[Byte])]
      .foreachPartition { (it: Iterator[(String, Array[Byte])]) =>
        import java.nio.file.{Files, Paths, StandardCopyOption}
        it.foreach { case (path, bytes) =>
          graft.sources.Dicom.decode(bytes).foreach { d =>
            val wc = d.tags.get("WindowCenter").flatMap(tagToDouble)
            val ww = d.tags.get("WindowWidth").flatMap(tagToDouble)
            val u8 = ImageKernels.applyWindowing(d.pixels, wc, ww)
            val stem = path.split('/').last.replaceAll("\\.[^.]*$", "")
            graft.kernels.Png.encodeGray(u8, d.rows, d.cols).foreach { png =>
              val tmp = Files.createTempFile(Paths.get(pngDir), s".$stem", ".tmp")
              Files.write(tmp, png)
              Files.move(tmp, Paths.get(pngDir, s"$stem.png"),
                StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
            }
          }
        }
      }
  }

  /** B1 UNDER STREAMING (SURVEY §2.J × §2.B1): the per-record binary sink
    * as a Structured Streaming `foreachBatch`, with exactly-once-per-file
    * effect. Pieces of the guarantee:
    *
    *  - the binaryFile STREAM source + checkpoint assigns every input file
    *    to exactly one micro-batch, replayed with the SAME contents on
    *    recovery (file-source offsets are the committed file list);
    *  - `foreachBatch` is at-least-once — a crash between sink write and
    *    commit redelivers the batch — so the sink itself must be
    *    idempotent: [[writePngBatch]] derives the target name from the
    *    input and replaces atomically, making redelivery a byte-identical
    *    overwrite, never a duplicate or a torn file.
    *
    * `Trigger.AvailableNow` drains everything present then stops — the
    * bounded-run form; omit it for a 24/7 incremental sink. Undecodable
    * inputs drop silently inside the batch body (C3), identical to the
    * batch [[writeWindowedPngs]] — StreamingSpec pins stream output ==
    * batch output byte-for-byte.
    */
  def startStreamingPngSink(spark: SparkSession, dicomDir: String,
      pngDir: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    new java.io.File(pngDir).mkdirs()
    // the binaryFile STREAM source requires its (fixed) schema up front —
    // streaming sources never infer
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile").schema(binaryFileSchema).load(dicomDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        writePngBatch(batch.toDF(), pngDir)
      }
      .start()
  }

  /** Analytic view over the slice table — the README's BigQuery examples
    * (`/root/reference/README.md:167-178`) as engine-native queries. */
  def avgIntensityByStudy(records: DataFrame, k: Int = 50): DataFrame =
    records.groupBy(col("study_uid"))
      .agg(round(avg(col("mean_intensity")), 6).as("avg_intensity"), count(lit(1)).as("n_images"))
      .orderBy(col("avg_intensity").desc, col("study_uid"))
      .limit(k)
}
