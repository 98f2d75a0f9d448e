package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame

/** Run-metrics sinks — parity with the reference's results sink
  * (`BFS_map_reduce.py:154-164`): append one `(Dataset, n_Workers,
  * Tempo)` row to a CSV, writing the header only when creating the
  * file.
  *
  * [[append]] is the faithful driver-side variant (the reference
  * appends from the driver after `ray.get`); [[writeCsv]] is the
  * distributed variant for metric DataFrames of any size.
  */
object MetricsSink {

  val Header = "Dataset,n_Workers,Tempo"

  /** Driver-side single-row append, header iff the file is new —
    * exactly the reference's `csv.writer` semantics. */
  def append(path: String, dataset: String, nWorkers: Int, seconds: Double): Unit = {
    val p = Paths.get(path)
    val isNew = !Files.exists(p)
    val row = s"$dataset,$nWorkers,$seconds\n"
    val payload = (if (isNew) Header + "\n" else "") + row
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, payload.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Distributed CSV append for a metrics DataFrame (header on, Spark
    * append-mode directory semantics). */
  def writeCsv(metrics: DataFrame, dir: String): Unit =
    metrics.write.mode("append").option("header", "true").csv(dir)
}
