package graft.jobs

import org.apache.spark.sql.Dataset

/** Generic arbitrary-binary escape hatch (SURVEY.md §2.B B10 / §2.A A6's
  * uncompiled path): stream a partition's rows through an external process's
  * stdin/stdout, like the reference's docker executor pipes a mounted file
  * through the container entrypoint
  * (pkg/executor/docker/executor.go:104-341).
  *
  * This is the `RDD.pipe` shape rebuilt on Dataset: the process runs ONCE
  * per partition on the executor (not per row), a writer thread feeds stdin
  * while the task thread consumes stdout, so arbitrarily large partitions
  * stream without buffering. Use only when a workload genuinely can't be
  * compiled to native ops (OpCompiler) — a piped plan is opaque to Catalyst:
  * no pushdown, no codegen, no column pruning through it.
  */
object PipeOps {

  /** Pipe each partition's lines through `cmd`, yielding the process's
    * stdout lines. The command must exist on every executor (the analog of
    * "the image must be pullable on every node"). */
  def pipe(ds: Dataset[String], cmd: Seq[String]): Dataset[String] = {
    import ds.sparkSession.implicits._
    val command = cmd // avoid closing over `this`
    ds.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val proc = new ProcessBuilder(command: _*)
          .redirectErrorStream(false)
          .start()
        val writer = new Thread(() => {
          val out = new java.io.PrintWriter(
            new java.io.BufferedWriter(
              new java.io.OutputStreamWriter(proc.getOutputStream,
                java.nio.charset.StandardCharsets.UTF_8)))
          try rows.foreach(out.println)
          finally out.close()
        }, "graft-pipe-writer")
        writer.setDaemon(true)
        writer.start()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream,
            java.nio.charset.StandardCharsets.UTF_8))
        Iterator.continually(in.readLine()).takeWhile(_ != null)
      }
    }
  }
}
