package graft.publish

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.jdk.CollectionConverters._

/** K5: the datalake put client — the engine-side twin of the
  * reference's `postDataToDatalake` / `postResulToDatalake`
  * (dynamicDataDb.py:347-418). The artifact selection, remote naming,
  * and zip packaging are deterministic engine code; the blob transport
  * itself is an injected `(remotePath, bytes) => Unit` — the same seam
  * as the K4 REST sink and the K7 mailer, so air-gapped tests drive
  * the full path and a production deployment injects an Azure (or any
  * object-store) client without engine changes.
  */
object Datalake {

  /** Upload every `*.json` artifact in `outputDir` to
    * `output/forecast/<datalakeFolder>/<name>` (dynamicDataDb.py:363-368),
    * in sorted name order for determinism. Returns the file count. */
  def putJsonArtifacts(outputDir: String, datalakeFolder: String,
                       put: (String, Array[Byte]) => Unit): Int = {
    val files = listFiles(Paths.get(outputDir))
      .filter(_.getFileName.toString.endsWith(".json"))
      .sortBy(_.getFileName.toString)
    files.foreach { f =>
      put(s"output/forecast/$datalakeFolder/${f.getFileName}",
        Files.readAllBytes(f))
    }
    files.length
  }

  /** Zip every file in `dir` (non-recursive, like the reference's
    * `zipFilesInDir`) into `zipPath`. Entries are name-sorted with
    * zeroed timestamps, so the archive bytes are a pure function of
    * the directory contents. */
  def zipDir(dir: String, zipPath: String): Unit = {
    val files = listFiles(Paths.get(dir))
      .filterNot(_.toString == zipPath)
      .sortBy(_.getFileName.toString)
    val zos = new ZipOutputStream(Files.newOutputStream(Paths.get(zipPath)))
    try files.foreach { f =>
      val e = new ZipEntry(f.getFileName.toString)
      e.setTime(0L)
      zos.putNextEntry(e)
      zos.write(Files.readAllBytes(f))
      zos.closeEntry()
    } finally zos.close()
  }

  /** Zip `outputDir` and upload it twice — once timestamped
    * (`ibf_model_results/<yyyyMMdd'T'HH>_model_outputs.zip`, the
    * retained history) and once at the fixed latest path
    * (`ibf_model_results/model_outputs.zip`) — exactly the
    * reference's double upload (dynamicDataDb.py:390-412).
    * `uploadTime` is the ISO instant the reference carries
    * ("yyyy-MM-dd'T'HH:mm:ss'Z'"). */
  def putModelOutputs(outputDir: String, uploadTime: String,
                      put: (String, Array[Byte]) => Unit): Unit = {
    val stamp = LocalDateTime.parse(uploadTime,
        DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .format(DateTimeFormatter.ofPattern("yyyyMMdd'T'HH"))
    val zipPath = Paths.get(outputDir, "model_outputs.zip").toString
    zipDir(outputDir, zipPath)
    val bytes = Files.readAllBytes(Paths.get(zipPath))
    put(s"ibf_model_results/${stamp}_model_outputs.zip", bytes)
    put("ibf_model_results/model_outputs.zip", bytes)
  }

  private def listFiles(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
    finally s.close()
  }
}
