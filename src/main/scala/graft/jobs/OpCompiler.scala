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
        try compileEntrypoint(spark, ep, inputs)
        catch {
          // B10 generic-binary escape hatch, opt-in via the `raw-exec`
          // annotation (arbitrary code must be asked for, never a silent
          // fallback): the sole input's rows stream through the entrypoint
          // as lines on stdin (PipeOps), stdout lines come back as `value`.
          // The command must exist on every executor — the analog of "the
          // image must be pullable on every node" (reference A6).
          case e: CompileError if spec.annotations.contains("raw-exec") =>
            val in = inputs.values.headOption.getOrElse(throw e)
            PipeOps.pipe(lineify(in), ep).toDF("value")
        }
      case "language" =>
        val lang = spec.language.getOrElse(throw CompileError("no language spec"))
        compileExpression(spark, lang, inputs)
      case "noop" =>
        spark.emptyDataFrame
      case e => throw CompileError(s"unknown engine: $e")
    }
  }

  /** A volume as a line stream: single column passes through as strings,
    * multi-column rows serialize as CSV lines (what `cat file.csv` into a
    * line-oriented program would see). */
  private def lineify(in: DataFrame): org.apache.spark.sql.Dataset[String] = {
    import org.apache.spark.sql.Encoders
    (if (in.columns.length == 1)
       in.select(col(in.columns.head).cast("string"))
     else in.select(to_csv(struct(in.columns.toIndexedSeq.map(col): _*))))
      .as[String](Encoders.STRING)
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

      // bash -c COMMAND — three compiled shapes:
      //   "cmd1 FILE | cmd2 | …"  → one composed Catalyst plan (filters
      //     still push down through the pipeline, unlike opaque PipeOps);
      //     pipe detection is quote-aware ('kiwi|mango' regexes survive)
      //     and '||' (logical OR) is never treated as a pipe
      //   "cat FILE [> OUT]"      → the scan side (B2; sink = Runner's
      //     output volumes)
      //   any single command      → tokenized and compiled as argv
      case Seq("bash" | "sh", "-c", cmd) =>
        splitTopLevelPipes(cmd) match {
          case Some(_) if hasTopLevel(cmd, '>') =>
            // refusing beats the silent wrongness of compiling only the
            // first stage and dropping the filters after the redirect
            throw CompileError(s"pipeline with redirect unsupported: $cmd")
          case Some(stages) => compilePipeline(stages, inputs)
          case None if cmd.startsWith("cat ") =>
            vol(inputs, cmd.split("\\s+")(1))
          case None =>
            compileEntrypoint(spark, tokenizeCmd(cmd), inputs)
        }

      // line-stream commands with a trailing file arg: grep/sed/sort/head/
      // wc/uniq/cut — the stage kernel is shared with the pipeline compiler
      case tokens if tokens.length >= 2 && lineCmds.contains(tokens.head) =>
        lineStage(vol(inputs, tokens.last), tokens.init)

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

  /** Commands whose compiled form is a transform of a single `value`
    * line column (shared between trailing-file commands and pipeline
    * stages). awk/cat/bash have their own structural cases above. */
  private val lineCmds =
    Set("grep", "sed", "sort", "head", "wc", "uniq", "cut", "tr")

  /** Expand tr-style `a-z` ranges into literal charsets ("a-c1" → "abc1").
    * A leading/trailing '-' stays literal, matching tr. */
  /** True when a grep pattern has no BRE metacharacters at all — the
    * common case, kept on the codegen'd contains() fast path. */
  private[jobs] def isRegexFree(pat: String): Boolean =
    !pat.exists(".*[]^$\\".contains(_))

  /** BRE → Java regex: in a BASIC regex, `+ ? ( ) { } |` are LITERAL
    * unless backslash-escaped (the inverse of Java/ERE). `. * [ ] ^ $`
    * carry the same meaning in both. */
  private[jobs] def breToJava(pat: String): String = {
    val javaOnlyMeta = "+?(){}|"
    val out = new StringBuilder
    var i = 0
    while (i < pat.length) {
      val c = pat.charAt(i)
      if (c == '\\' && i + 1 < pat.length &&
          javaOnlyMeta.indexOf(pat.charAt(i + 1)) >= 0) {
        out += pat.charAt(i + 1) // BRE \( … = grouping → Java bare metachar
        i += 2
      } else if (c == '\\' && i + 1 < pat.length) {
        out += '\\'; out += pat.charAt(i + 1); i += 2
      } else if (javaOnlyMeta.indexOf(c) >= 0) {
        out += '\\'; out += c; i += 1 // literal in BRE → escape for Java
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Quote a sed replacement for Java's regexp_replace: REPL is literal
    * text to sed, but `$` and `\` are group references to Matcher. */
  private[jobs] def quoteRepl(repl: String): String =
    repl.replace("\\", "\\\\").replace("$", "\\$")

  private[jobs] def expandTrRanges(set: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < set.length) {
      if (i + 2 < set.length && set.charAt(i + 1) == '-' &&
          set.charAt(i + 2) >= set.charAt(i)) {
        (set.charAt(i) to set.charAt(i + 2)).foreach(sb += _)
        i += 3
      } else { sb += set.charAt(i); i += 1 }
    }
    sb.toString
  }

  /** Minimal shell tokenizer for pipeline stages: whitespace-split with
    * single/double-quote grouping (enough for the supported command set —
    * regex/program args are always one quoted token). */
  private[jobs] def tokenizeCmd(cmd: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var quote: Char = 0
    var tokenOpen = false // distinguishes '' (empty token) from no token
    cmd.foreach { c =>
      if (quote != 0) { if (c == quote) quote = 0 else sb += c }
      else if (c == '\'' || c == '"') { quote = c; tokenOpen = true }
      else if (c.isWhitespace) {
        if (tokenOpen || sb.nonEmpty) { out += sb.toString; sb.clear() }
        tokenOpen = false
      } else { sb += c; tokenOpen = true }
    }
    if (tokenOpen || sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  /** True when `ch` occurs outside quotes (for redirect detection — a '>'
    * inside a quoted grep pattern is not a redirect). */
  private[jobs] def hasTopLevel(cmd: String, ch: Char): Boolean = {
    var quote: Char = 0
    var i = 0
    while (i < cmd.length) {
      val c = cmd.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') quote = c
      else if (c == ch) return true
      i += 1
    }
    false
  }

  /** Split on top-level (unquoted) '|'. None when there is no true pipe —
    * pipes inside quotes are regex alternation, and `||` is logical OR.
    * A command MIXING real pipes with `||` is refused outright (compiling
    * only part of it would be silently wrong). */
  private[jobs] def splitTopLevelPipes(cmd: String): Option[Seq[String]] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var quote: Char = 0
    var sawPipe = false
    var sawLogicalOr = false
    var i = 0
    while (i < cmd.length) {
      val c = cmd.charAt(i)
      if (quote != 0) { sb += c; if (c == quote) quote = 0; i += 1 }
      else if (c == '\'' || c == '"') { quote = c; sb += c; i += 1 }
      else if (c == '|') {
        if (i + 1 < cmd.length && cmd.charAt(i + 1) == '|') {
          sawLogicalOr = true
          sb ++= "||"
          i += 2
        } else {
          sawPipe = true
          parts += sb.toString
          sb.clear()
          i += 1
        }
      } else { sb += c; i += 1 }
    }
    parts += sb.toString
    if (sawPipe && sawLogicalOr)
      throw CompileError(s"pipeline mixing '|' and '||' unsupported: $cmd")
    if (sawPipe) Some(parts.toSeq.map(_.trim).filter(_.nonEmpty)) else None
  }

  /** Pipeline stage strings → one composed plan. */
  private def compilePipeline(stageStrs: Seq[String],
                              inputs: Map[String, DataFrame]): DataFrame = {
    val stages = stageStrs.map(tokenizeCmd)
    if (stages.isEmpty) throw CompileError("empty pipeline")
    val first = stages.head
    if (first.length < 2 || !lineCmds.contains(first.head) &&
        first.head != "cat")
      throw CompileError(s"unsupported pipeline head: ${first.mkString(" ")}")
    val src = vol(inputs, first.last)
    val head =
      if (first.head == "cat") src else lineStage(src, first.init)
    // each stage sees its predecessor's tokens (uniq -c inherits the
    // preceding sort's direction, matching Unix adjacency output order)
    stages.tail.foldLeft((head, first)) { case ((df, prev), stage) =>
      (lineStage(df, stage, prev), stage)
    }._1
  }

  /** One line-stream stage: DataFrame with a `value` column → DataFrame.
    * Aggregating stages (wc, uniq -c) are valid only as the last stage the
    * same way their Unix forms end a pipeline usefully. `prev` carries the
    * preceding stage's tokens for order-sensitive stages. */
  private def lineStage(df: DataFrame, tokens: Seq[String],
                        prev: Seq[String] = Nil): DataFrame =
    tokens match {
      // grep family (B3). Plain grep patterns are BREs, not literals:
      // metachar-free patterns keep the codegen-friendly contains(), any
      // '.*[]^$\' pattern goes through the BRE→Java translation.
      case Seq("grep", pat) =>
        if (isRegexFree(pat)) df.filter(col("value").contains(pat))
        else df.filter(col("value").rlike(breToJava(pat)))
      case Seq("grep", "-E", pat) => df.filter(col("value").rlike(pat))
      case Seq("grep", "-v", pat) =>
        if (isRegexFree(pat)) df.filter(!col("value").contains(pat))
        else df.filter(!col("value").rlike(breToJava(pat)))
      case Seq("grep", "-c", pat) =>
        (if (isRegexFree(pat)) df.filter(col("value").contains(pat))
         else df.filter(col("value").rlike(breToJava(pat))))
          .agg(count(lit(1)).as("n"))

      // B4: sed -n '/RE/p' — print matching lines (BRE semantics).
      case Seq("sed", "-n", prog) if prog.startsWith("/") && prog.endsWith("/p") =>
        df.filter(col("value").rlike(
          breToJava(prog.stripPrefix("/").stripSuffix("/p"))))

      // sed 's/RE/REPL/[g]' — substitution (examples/gps-substitution).
      // Without /g sed replaces only the first match; regexp_replace
      // replaces all, so the first-match form anchors via a capture.
      // REPL is literal text to sed (modulo \N backrefs, unsupported):
      // quote '$' and '\' so Java's Matcher doesn't read group references.
      case Seq("sed", prog) if prog.startsWith("s/") =>
        prog.stripPrefix("s/").split('/') match {
          case Array(re, repl, "g") =>
            df.select(regexp_replace(col("value"), breToJava(re),
              quoteRepl(repl)).as("value"))
          case Array(re, repl) =>
            df.select(regexp_replace(col("value"),
              s"^((?s).*?)(${breToJava(re)})",
              "$1" + quoteRepl(repl)).as("value"))
          case _ => throw CompileError(s"unsupported sed program: $prog")
        }

      // ordering / truncation
      case Seq("sort")       => df.orderBy(col("value").asc)
      case Seq("sort", "-r") => df.orderBy(col("value").desc)
      case Seq("head", "-n", n) => df.limit(n.toInt)
      case Seq("head", n) if n.startsWith("-") && n.drop(1).forall(_.isDigit) =>
        df.limit(n.drop(1).toInt)

      // counts (B6 + word/byte counts)
      case Seq("wc", "-l") => df.agg(count(lit(1)).as("n"))
      case Seq("wc", "-w") =>
        // blank lines contribute ZERO words: split("") yields one empty
        // token (size 1), which over-counted every whitespace-only line
        df.agg(sum(when(trim(col("value")) === "", 0)
          .otherwise(size(split(trim(col("value")), "\\s+")))).as("n"))
      case Seq("wc", "-c") => // bytes incl. each line's newline
        df.agg(sum(octet_length(col("value")) + 1).as("n"))

      // tr SET1 SET2 — character translation; a-z style ranges expand to
      // their literal charsets for Spark's translate()
      case Seq("tr", from, to) =>
        df.select(translate(col("value"),
          expandTrRanges(from), expandTrRanges(to)).as("value"))

      // uniq -c — meaningful after `sort` (Unix adjacency semantics ==
      // group-by once sorted); emits (n, value) columns in the preceding
      // sort's direction, so a following head/limit truncates the same
      // rows Unix would
      case Seq("uniq", "-c") =>
        val grouped = df.groupBy("value").agg(count(lit(1)).as("n"))
          .select(col("n"), col("value"))
        // prefix check: the first pipeline stage's tokens carry the file arg
        if (prev.startsWith(Seq("sort", "-r"))) grouped.orderBy(col("value").desc)
        else grouped.orderBy(col("value").asc)

      // cut -dC -fN[,M…] — field projection rejoined with the delimiter
      // (stays a single text line stream, composable with later stages)
      case Seq("cut", d, f) if d.startsWith("-d") && f.startsWith("-f") =>
        val delim = d.drop(2)
        if (delim.length != 1) throw CompileError(s"cut: need 1-char delim: $d")
        val fields = f.drop(2).split(',').map(_.trim.toInt)
        if (fields.exists(_ < 1)) throw CompileError(s"cut: fields are 1-based: $f")
        val parts = split(col("value"), java.util.regex.Pattern.quote(delim))
        df.select(concat_ws(delim,
          fields.toIndexedSeq.map(i => element_at(parts, i)): _*).as("value"))

      case other =>
        throw CompileError(s"unsupported pipeline stage: ${other.mkString(" ")}")
    }

  /** Expression-mode jobs (reference language engine, A7): the command is
    * `SELECT …` SQL over the mounted volumes registered as temp views, or a
    * single Column expression applied to the sole input. `language=python`
    * routes to the real-interpreter program path (B7). */
  def compileExpression(spark: SparkSession, lang: JobSpecLanguage,
                        inputs: Map[String, DataFrame]): DataFrame = {
    if (lang.language.startsWith("python"))
      return compilePython(spark, lang, inputs)
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

  /** First python3/python on PATH, if any (the "interpreter installed on
    * this node" admission fact — like "docker is installed"). */
  lazy val pythonInterpreter: Option[String] = {
    val sep = java.io.File.pathSeparator
    sys.env.getOrElse("PATH", "").split(sep).iterator
      .flatMap(dir => Seq("python3", "python").map(n =>
        java.nio.file.Paths.get(dir, n)))
      .find(p => java.nio.file.Files.isExecutable(p))
      .map(_.toString)
  }

  /** Deterministic Python PROGRAM jobs (B7 full parity; reference pyodide
    * chain pkg/executor/python_wasm/executor.go:113-138, E2E
    * pkg/test/devstack/pythonwasm_test.go:55-120 — read the input volume,
    * write the output volume). The volume mapping is line-oriented: the
    * sole input volume streams to the program's stdin (CSV lines for
    * multi-column frames), stdout lines become the result rows the Runner
    * publishes to the output volume — RDD.pipe semantics via PipeOps,
    * once per partition.
    *
    * Determinism gate (the reference rejects deterministic=false outright,
    * cmd/bacalhau/run_python.go): deterministic=false is a CompileError,
    * and accepted programs run under `-I` (isolated: no env, no user
    * site-packages) with PYTHONHASHSEED=0, the CPython analog of pyodide's
    * hermetic sandbox — same program + same input ⇒ same bytes, which is
    * what cross-replica hash verification (A12) needs. A node without an
    * interpreter fails admission cleanly at compile time, the analog of
    * "no docker installed on this node". */
  private def compilePython(spark: SparkSession, lang: JobSpecLanguage,
                            inputs: Map[String, DataFrame]): DataFrame = {
    if (!lang.deterministic)
      throw CompileError(
        "python jobs must declare deterministic=true (reference gate)")
    val py = pythonInterpreter.getOrElse(
      throw CompileError("no python3 interpreter installed on this node"))
    if (lang.command.trim.isEmpty) throw CompileError("empty python program")
    val in = inputs.values.headOption.getOrElse {
      // programs with no input volume still run once: feed one empty line
      import org.apache.spark.sql.Encoders
      spark.range(1).select(lit("").as("value")).as[String](Encoders.STRING)
        .toDF("value")
    }
    PipeOps.pipe(lineify(in), Seq(py, "-I", "-c", lang.command),
      env = Map("PYTHONHASHSEED" -> "0")).toDF("value")
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
