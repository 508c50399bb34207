package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entrypoint → DataFrame compiler: the canonical workloads the reference
  * executes in containers (SURVEY §2.B, pkg/test/scenario/
  * test_scenarios.go:17-171) become native Catalyst plans.
  *
  *  - B1 `cat FILE`                → scan (identity projection)
  *  - B3 `grep PAT FILE`           → substring/regex filter
  *  - B4 `sed -n '/RE/p' FILE`     → regex filter (BRE kept verbatim:
  *    `.` stays any-char, matching sed semantics — SURVEY §2.B B4 note)
  *  - B5 `awk -F, '{x=A-$i; y=B-$j; if(x^2+y^2<r^2) print}'` → projection +
  *    scalar arithmetic + theta filter over the CSV schema
  *  - B6 `wc -l FILE`              → count(*)
  *  - `bash -c 'cat A > B'`        → scan + sink (B2; handled by Runner's
  *    output volumes)
  *
  * Anything else is rejected — the reference's generic-container escape
  * hatch (B10) maps to `Dataset.mapPartitions` with a user transform, which
  * is an API (see PipeOps), not a string compiler.
  */
object OpCompiler {

  final case class CompileError(msg: String) extends Exception(msg)

  /** awk GPS-proximity program shape (test_scenarios.go:134-161):
    * {x=A-$3; y=B-$4; if(x^2+y^2<R^2) print $0} with -F, */
  /** awk pure-projection program: `{print $3","$4}` and friends. */
  private val AwkPrint = """\{\s*print\s+((?:\$\d+(?:\s*"[^"]*"\s*)?)+)\s*\}""".r

  private val AwkTheta =
    """\{?\s*x\s*=\s*(-?[\d.]+)\s*-\s*\$(\d+)\s*;\s*y\s*=\s*(-?[\d.]+)\s*-\s*\$(\d+)\s*;\s*if\s*\(\s*x\^2\s*\+\s*y\^2\s*<\s*(-?[\d.]+)\^2\s*\)\s*print.*\}?\s*""".r

  def compile(spark: SparkSession, spec: JobSpec,
              inputs: Map[String, DataFrame]): DataFrame = {
    spec.engine match {
      case "docker" =>
        val ep = spec.docker.getOrElse(throw CompileError("no docker spec"))
          .entrypoint
        compileEntrypoint(spark, ep, inputs)
      case "language" =>
        val lang = spec.language.getOrElse(throw CompileError("no language spec"))
        compileExpression(spark, lang, inputs)
      case "noop" =>
        spark.emptyDataFrame
      case e => throw CompileError(s"unknown engine: $e")
    }
  }

  /** Resolve the DataFrame a path argument refers to (mounted volume). */
  private def vol(inputs: Map[String, DataFrame], path: String): DataFrame =
    inputs.getOrElse(path,
      inputs.getOrElse(path.stripPrefix("/"),
        throw CompileError(s"no input volume mounted at '$path'")))

  def compileEntrypoint(spark: SparkSession, ep: Seq[String],
                        inputs: Map[String, DataFrame]): DataFrame =
    ep match {
      // B1: cat FILE (identity)
      case Seq("cat", path) => vol(inputs, path)

      // B2-style: bash -c "cat FILE > OUT" — the scan side; sink handled
      // by the Runner's output volumes
      case Seq("bash", "-c", cmd) if cmd.startsWith("cat ") =>
        vol(inputs, cmd.split("\\s+")(1))

      // B6: wc -l FILE
      case Seq("wc", "-l", path) =>
        vol(inputs, path).agg(count(lit(1)).as("n"))

      // B3: grep [-E|-v|-c] PATTERN FILE over text lines
      case Seq("grep", pat, path) =>
        vol(inputs, path).filter(col("value").contains(pat))
      case Seq("grep", "-E", pat, path) =>
        vol(inputs, path).filter(col("value").rlike(pat))
      case Seq("grep", "-v", pat, path) =>
        vol(inputs, path).filter(!col("value").contains(pat))
      case Seq("grep", "-c", pat, path) =>
        vol(inputs, path).filter(col("value").contains(pat))
          .agg(count(lit(1)).as("n"))

      // B4: sed -n '/RE/p' FILE — print matching lines. sed BRE regexes in
      // the reference corpus use only literals, '.', bracket ranges — all
      // identical in Java regex, so the pattern passes through verbatim.
      case Seq("sed", "-n", prog, path) if prog.startsWith("/") && prog.endsWith("/p") =>
        val re = prog.stripPrefix("/").stripSuffix("/p")
        vol(inputs, path).filter(col("value").rlike(re))

      // sed 's/RE/REPL/[g]' FILE — substitution (the reference example
      // family's namesake, examples/gps-substitution). Without /g sed
      // replaces only the first match; regexp_replace replaces all, so the
      // first-match form anchors via a capturing rewrite.
      case Seq("sed", prog, path) if prog.startsWith("s/") =>
        prog.stripPrefix("s/").split('/') match {
          case Array(re, repl, "g") =>
            vol(inputs, path)
              .select(regexp_replace(col("value"), re, repl).as("value"))
          case Array(re, repl) =>
            // first occurrence only: capture prefix up to first match
            vol(inputs, path).select(
              regexp_replace(col("value"), s"^((?s).*?)($re)",
                "$1" + repl.replace("$", "\\$")).as("value"))
          case other =>
            throw CompileError(s"unsupported sed program: $prog")
        }

      // awk -F, '{print $i","$j…}' FILE — column projection
      case Seq("awk", "-F,", AwkPrint(body), path) =>
        val df = vol(inputs, path)
        val cols = "\\$(\\d+)".r.findAllMatchIn(body)
          .map(m => df.columns(m.group(1).toInt - 1)).toSeq
        if (cols.isEmpty) throw CompileError(s"awk print with no columns")
        df.select(cols.map(col): _*)

      // B5: awk -F, 'GPS theta program' FILE
      case Seq("awk", "-F,", prog, path) =>
        prog.trim match {
          case AwkTheta(a, i, b, j, r) =>
            val df = vol(inputs, path)
            // awk $n is 1-based over the CSV split of the raw line
            val ci = df.columns(i.toInt - 1)
            val cj = df.columns(j.toInt - 1)
            val x = lit(a.toDouble) - col(ci)
            val y = lit(b.toDouble) - col(cj)
            df.filter(x * x + y * y < lit(r.toDouble) * lit(r.toDouble))
          case other => throw CompileError(s"unsupported awk program: $other")
        }

      case other => throw CompileError(s"unsupported entrypoint: $other")
    }

  /** Expression-mode jobs (reference language engine, A7): the command is
    * `SELECT …` SQL over the mounted volumes registered as temp views, or a
    * single Column expression applied to the sole input. */
  def compileExpression(spark: SparkSession, lang: JobSpecLanguage,
                        inputs: Map[String, DataFrame]): DataFrame = {
    inputs.foreach { case (name, df) =>
      df.createOrReplaceTempView(name.stripPrefix("/").replaceAll("[^A-Za-z0-9_]", "_"))
    }
    val df =
      if (lang.command.trim.toLowerCase.startsWith("select"))
        spark.sql(lang.command)
      else {
        val in = inputs.values.headOption
          .getOrElse(throw CompileError("expression job with no input"))
        in.select(expr(lang.command))
      }
    if (lang.deterministic) DeterminismGate.check(df)
    df
  }
}

/** Determinism gate (reference: the language executor only accepts
  * `Deterministic=true` programs — pkg/executor/language/executor.go:47-62;
  * our analog rejects plans containing nondeterministic expressions, the
  * Catalyst-level meaning of "deterministic"). */
object DeterminismGate {
  final case class NondeterministicPlan(exprs: Seq[String])
      extends Exception(s"nondeterministic expressions: ${exprs.mkString(", ")}")

  def check(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    // report root causes only: nondeterministic nodes whose children are
    // all deterministic (wrappers like Alias inherit the flag and are noise)
    val bad = plan.collect { case node =>
      node.expressions.flatMap(_.collect {
        case e if !e.deterministic && e.children.forall(_.deterministic) =>
          e.prettyName
      })
    }.flatten.distinct
    if (bad.nonEmpty) throw NondeterministicPlan(bad)
    df
  }
}
