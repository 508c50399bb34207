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
    * "the image must be pullable on every node").
    *
    * Failure semantics (mirrors the reference's exitCode capture,
    * pkg/executor/docker/executor.go:274-338): stderr is drained on a
    * daemon thread (a chatty child can't deadlock on a full OS pipe
    * buffer), an exit code outside `okExit` throws with the stderr tail
    * (no silent truncation; grep-like tools exit 1 on "no matches" — pass
    * okExit=Set(0,1) for those), and a task-completion listener kills the
    * child if the iterator is abandoned early (e.g. under a LIMIT). */
  def pipe(ds: Dataset[String], cmd: Seq[String],
           okExit: Set[Int] = Set(0),
           env: Map[String, String] = Map.empty): Dataset[String] = {
    import ds.sparkSession.implicits._
    val command = cmd // avoid closing over `this`
    val extraEnv = env
    ds.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val pb = new ProcessBuilder(command: _*)
          .redirectErrorStream(false)
        extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
        val proc = pb.start()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            if (proc.isAlive) proc.destroyForcibly()
          })
        val errTail = new java.util.concurrent.ConcurrentLinkedDeque[String]()
        val errDrain = new Thread(() => {
          val er = new java.io.BufferedReader(
            new java.io.InputStreamReader(proc.getErrorStream, utf8))
          try Iterator.continually(er.readLine()).takeWhile(_ != null)
            .foreach { l =>
              errTail.addLast(l)
              while (errTail.size > 16) errTail.pollFirst()
            }
          catch { case _: java.io.IOException => () }
        }, "graft-pipe-stderr")
        errDrain.setDaemon(true)
        errDrain.start()
        val writer = new Thread(() => {
          val out = new java.io.PrintWriter(
            new java.io.BufferedWriter(
              new java.io.OutputStreamWriter(proc.getOutputStream, utf8)))
          // a child that exits mid-stream breaks the pipe; swallow the
          // IOException here — the exit-code check below reports the cause
          try rows.foreach(out.println)
          catch { case _: Exception => () }
          finally out.close()
        }, "graft-pipe-writer")
        writer.setDaemon(true)
        writer.start()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, utf8))
        val stdout = Iterator.continually(in.readLine()).takeWhile(_ != null)
        val exitCheck = new Iterator[String] {
          private var done = false
          def hasNext: Boolean = {
            if (!done) {
              done = true
              val code = proc.waitFor()
              errDrain.join(2000)
              if (!okExit.contains(code))
                throw new RuntimeException(
                  s"pipe command '${command.mkString(" ")}' exited $code; " +
                    s"stderr tail: ${String.join(" | ", errTail)}")
            }
            false
          }
          def next(): String = throw new NoSuchElementException
        }
        stdout ++ exitCheck
      }
    }
  }
}
