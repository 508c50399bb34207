package graft.jobs

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.{Files, Paths}

/** Control-plane specs mirroring the reference's three test levels
  * (SURVEY §5): scenario E2E (cat/grep/sed/awk golden checks —
  * pkg/test/scenario/test_scenarios.go), behavioral lifecycle tests
  * (concurrency fold — pkg/test/devstack/concurrency_test.go:46-105), and
  * unit tests for parsing/admission. */
class ControlPlaneSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private var dir: String = _

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("graft-cp").toString
    // A1 fruit_lines fixture (FIXTURES.md): 9 lines, two contain kiwi
    Files.writeString(Paths.get(s"$dir/grep_file.txt"),
      Seq("apple", "banana", "kiwi", "cherry", "mango", "kiwi is delicious",
        "plum", "grape", "pear").mkString("", "\n", "\n"))
    // A2 sensor_readings fixture: header + 40 rows; 5 in the Lisbon regex
    // box (lat 38.72-38.74, long -9.13..-9.17), 7 within 0.3 deg of center
    val center = (38.7077507, -9.1365919)
    val rows = (0 until 40).map { k =>
      val (lat, lon) =
        if (k < 5) (38.72 + k * 0.005, -9.13 - k * 0.008) // regex box + near
        else if (k < 7) (38.8 + k * 0.001, -9.2)          // near center only
        else (40.0 + k * 0.1, -8.0 - k * 0.1)             // far
      f"2021-01-01 00:$k%02d:00,LISBON,$lat%.4f,$lon%.4f,${15.0 + k}%.4f,${k * 1.1}%.4f"
    }
    Files.writeString(Paths.get(s"$dir/sensor.csv"),
      ("sensor_time,sensor_group,lat,long,temperature,distance" +: rows)
        .mkString("", "\n", "\n"))
  }

  override def afterAll(): Unit = spark.stop()

  private def textVol(path: String) =
    Map("/data/file.txt" -> spark.read.text(path))
  private def csvVol(path: String) =
    Map("/data/file.csv" -> spark.read.option("header", "true")
      .option("inferSchema", "true").csv(path))

  // ---- Resources (capacitymanager/utils.go analog)
  test("k8s-style resource parsing") {
    assert(Resources.parseCpu("500m") === 0.5)
    assert(Resources.parseCpu("2") === 2.0)
    assert(Resources.parseMemory("2Gb") === 2000000000L)
    assert(Resources.parseMemory("2Gi") === 2147483648L)
    assert(Resources.parseMemory("100Mb") === 100000000L)
    assert(Resources.withDefaults(ResourceUsage()).cpuCores === 0.1)
    intercept[IllegalArgumentException](Resources.parseMemory("5xyz"))
  }

  // ---- B1 cat: identity scan, stdout equivalence
  test("B1 cat = identity scan") {
    val df = OpCompiler.compileEntrypoint(spark,
      Seq("cat", "/data/file.txt"), textVol(s"$dir/grep_file.txt"))
    val lines = df.collect().map(_.getString(0))
    assert(lines.length === 9 && lines.head === "apple")
  }

  // ---- B3 grep kiwi: 2 lines incl. 'kiwi is delicious'
  test("B3 grep kiwi = contains filter, 2 matches") {
    val df = OpCompiler.compileEntrypoint(spark,
      Seq("grep", "kiwi", "/data/file.txt"), textVol(s"$dir/grep_file.txt"))
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got === Seq("kiwi", "kiwi is delicious"))
  }

  // ---- B4 sed Lisbon box regex: BRE passes through, 5 matches
  test("B4 sed -n /re/p = regex filter") {
    val raw = Map("/data/file.txt" -> spark.read.text(s"$dir/sensor.csv"))
    val df = OpCompiler.compileEntrypoint(spark,
      Seq("sed", "-n", "/38.7[2-4]..,-9.1[3-7]../p", "/data/file.txt"), raw)
    assert(df.count() === 5)
  }

  // ---- B5 awk GPS theta filter over parsed CSV
  test("B5 awk theta filter compiles to arithmetic + filter") {
    val df = OpCompiler.compileEntrypoint(spark,
      Seq("awk", "-F,",
        "{x=38.7077507-$3; y=-9.1365919-$4; if(x^2+y^2<0.3^2) print $0}",
        "/data/file.csv"),
      csvVol(s"$dir/sensor.csv"))
    assert(df.count() === 7) // 5 box rows + 2 near-center rows
  }

  // ---- B6 wc -l
  test("B6 wc -l = count") {
    val df = OpCompiler.compileEntrypoint(spark,
      Seq("wc", "-l", "/data/file.txt"), textVol(s"$dir/grep_file.txt"))
    assert(df.collect()(0).getLong(0) === 9)
  }

  // r4 review fixes: Unix semantics for blank lines, BRE patterns, and
  // literal '$'/'\' in sed replacements
  test("wc -w skips blank lines; grep treats patterns as BREs; sed REPL is literal") {
    import java.nio.file.{Files, Paths}
    val f = s"$dir/mixed.txt"
    Files.writeString(Paths.get(f),
      "hello there\n\nERROR disk full\nnot an error: USD 5\n   \nERROR again\n")
    def vol = Map("/data/file.txt" -> spark.read.text(f))
    // wc -w: 'hello there'(2) + ERROR lines(3+2) + 'not an error: USD 5'(5)
    val words = OpCompiler.compileEntrypoint(spark,
      Seq("wc", "-w", "/data/file.txt"), vol)
    assert(words.collect()(0).getLong(0) === 12)
    // grep '^ERROR' is an anchored BRE, not a literal caret
    val anchored = OpCompiler.compileEntrypoint(spark,
      Seq("grep", "^ERROR", "/data/file.txt"), vol)
    assert(anchored.collect().map(_.getString(0)).toSeq ===
      Seq("ERROR disk full", "ERROR again"))
    // BRE wildcards: 'disk.*full' spans within the line; '+' stays LITERAL
    // unescaped (BRE) so 'USD+' matches nothing even though 'USD' appears
    val star = OpCompiler.compileEntrypoint(spark,
      Seq("grep", "disk.*full", "/data/file.txt"), vol)
    assert(star.count() === 1)
    val plus = OpCompiler.compileEntrypoint(spark,
      Seq("grep", "USD+.", "/data/file.txt"), vol)
    assert(plus.count() === 0)
    // sed replacement containing '$' must be literal, not a group ref
    val dollar = OpCompiler.compileEntrypoint(spark,
      Seq("sed", "s/USD/$/g", "/data/file.txt"), vol)
    assert(dollar.collect().map(_.getString(0))
      .contains("not an error: $ 5"))
  }

  // ---- validation: path doubles as the source for file volumes (cid-less
  // inputs stay valid — SourceResolver reads the path itself), while
  // path-less volumes and url-less urldownloads are submit-time errors
  test("volume validation: path-as-source valid, missing path/url rejected") {
    val pathAsSource = JobSpec(engine = "docker",
      docker = Some(JobSpecDocker(image = "x", entrypoint = Seq("cat", "/d"))),
      inputs = Seq(StorageSpec(engine = "file", name = "in", path = "/d")))
    assert(pathAsSource.validate().isRight)
    assert(JobSpec(engine = "noop", inputs = Seq(
      StorageSpec(engine = "file", name = "in", path = ""))).validate().isLeft)
    assert(JobSpec(engine = "noop", inputs = Seq(
      StorageSpec(engine = "urldownload", name = "u", path = "/d")))
      .validate().isLeft)
  }

  test("grep -v / grep -c variants") {
    val vNeg = OpCompiler.compileEntrypoint(spark,
      Seq("grep", "-v", "kiwi", "/data/file.txt"), textVol(s"$dir/grep_file.txt"))
    assert(vNeg.count() === 7)
    val cnt = OpCompiler.compileEntrypoint(spark,
      Seq("grep", "-c", "kiwi", "/data/file.txt"), textVol(s"$dir/grep_file.txt"))
    assert(cnt.collect()(0).getLong(0) === 2)
  }

  test("sed substitution: global and first-match forms") {
    val g = OpCompiler.compileEntrypoint(spark,
      Seq("sed", "s/kiwi/mango/g", "/data/file.txt"),
      textVol(s"$dir/grep_file.txt"))
    val gLines = g.collect().map(_.getString(0))
    // 1 pre-existing mango line + 2 substituted kiwi lines
    assert(gLines.count(_.contains("mango")) === 3 &&
      !gLines.exists(_.contains("kiwi")))
    // first-match form replaces only the first occurrence per line
    import spark.implicits._
    val two = Map("/d" -> Seq("kiwi kiwi").toDF("value"))
    val f = OpCompiler.compileEntrypoint(spark,
      Seq("sed", "s/kiwi/mango/", "/d"), two)
    assert(f.collect()(0).getString(0) === "mango kiwi")
  }

  test("awk column projection: print $3\",\"$4") {
    val df = OpCompiler.compileEntrypoint(spark,
      Seq("awk", "-F,", """{print $3","$4}""", "/data/file.csv"),
      csvVol(s"$dir/sensor.csv"))
    assert(df.columns.toSeq === Seq("lat", "long"))
    assert(df.count() === 40)
  }

  test("coreutils breadth: sort, head, cut, wc -w") {
    val t = textVol(s"$dir/grep_file.txt")
    val sorted = OpCompiler.compileEntrypoint(spark,
      Seq("sort", "/data/file.txt"), t).collect().map(_.getString(0))
    assert(sorted.toSeq === sorted.sorted.toSeq && sorted.length === 9)
    val headed = OpCompiler.compileEntrypoint(spark,
      Seq("head", "-n", "3", "/data/file.txt"), t).collect()
    assert(headed.length === 3 && headed(0).getString(0) === "apple")
    val cutCols = OpCompiler.compileEntrypoint(spark,
      Seq("cut", "-d,", "-f3,4",  "/data/file.txt"),
      Map("/data/file.txt" -> spark.read.text(s"$dir/sensor.csv")))
      .collect().map(_.getString(0))
    assert(cutCols.head === "lat,long") // header line cut to fields 3,4
    val words = OpCompiler.compileEntrypoint(spark,
      Seq("wc", "-w", "/data/file.txt"), t).collect()(0).getLong(0)
    assert(words === 11) // 9 lines, one has 3 words ("kiwi is delicious")
    val bytes = OpCompiler.compileEntrypoint(spark,
      Seq("wc", "-c", "/data/file.txt"), t).collect()(0).getLong(0)
    assert(bytes === Files.size(Paths.get(s"$dir/grep_file.txt")))
    // tr with range expansion, standalone and as a pipeline stage
    val upper = OpCompiler.compileEntrypoint(spark,
      Seq("tr", "a-z", "A-Z", "/data/file.txt"), t)
      .collect().map(_.getString(0))
    assert(upper.contains("KIWI IS DELICIOUS"))
    val piped = OpCompiler.compileEntrypoint(spark,
      Seq("bash", "-c", "grep kiwi /data/file.txt | tr a-z A-Z | wc -l"), t)
      .collect()(0).getLong(0)
    assert(piped === 2)
  }

  test("compiled bash -c pipelines compose into one plan") {
    val t = textVol(s"$dir/grep_file.txt")
    // grep | wc -l
    val n = OpCompiler.compileEntrypoint(spark,
      Seq("bash", "-c", "grep kiwi /data/file.txt | wc -l"), t)
      .collect()(0).getLong(0)
    assert(n === 2)
    // sed s/// | grep: substitution feeds the filter
    val subbed = OpCompiler.compileEntrypoint(spark,
      Seq("bash", "-c", "sed 's/kiwi/mango/g' /data/file.txt | grep mango"), t)
      .collect().map(_.getString(0))
    assert(subbed.length === 3) // 1 original mango + 2 substituted
    // sort | head: global order then truncate
    val top = OpCompiler.compileEntrypoint(spark,
      Seq("bash", "-c", "sort /data/file.txt | head -n 2"), t)
      .collect().map(_.getString(0))
    assert(top.toSeq === Seq("apple", "banana"))
    // sort | uniq -c: adjacency == group-by once sorted
    import spark.implicits._
    val dup = Map("/d" -> Seq("b", "a", "b", "b").toDF("value"))
    val counted = OpCompiler.compileEntrypoint(spark,
      Seq("bash", "-c", "sort /d | uniq -c"), dup)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(counted.toSeq === Seq((1L, "a"), (3L, "b")))
    // the composed pipeline is ONE plan: grep filter sits under the agg
    val plan = OpCompiler.compileEntrypoint(spark,
      Seq("bash", "-c", "grep kiwi /data/file.txt | wc -l"), t)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Filter") && plan.contains("Aggregate"))
    // unsupported stages are compile errors, not silent passthrough
    intercept[OpCompiler.CompileError] {
      OpCompiler.compileEntrypoint(spark,
        Seq("bash", "-c", "grep kiwi /data/file.txt | frobnicate"), t)
    }
  }

  test("pipeline parsing edge cases: quoted pipes, redirects, ||") {
    val t = textVol(s"$dir/grep_file.txt")
    // '|' inside a quoted regex is alternation, NOT a pipe — the command
    // compiles as a single grep -E via the bash -c fallback
    val alt = OpCompiler.compileEntrypoint(spark,
      Seq("bash", "-c", "grep -E 'kiwi|mango' /data/file.txt"), t)
      .collect().map(_.getString(0))
    assert(alt.toSeq === Seq("kiwi", "mango", "kiwi is delicious"))
    // a pipeline that also redirects must refuse, not silently compile
    // only the first stage
    intercept[OpCompiler.CompileError] {
      OpCompiler.compileEntrypoint(spark, Seq("bash", "-c",
        "cat /data/file.txt | grep kiwi > /outputs/out"), t)
    }
    // '||' is logical OR, not a pipe: "cat f || true" compiles as the scan
    val orr = OpCompiler.compileEntrypoint(spark,
      Seq("bash", "-c", "cat /data/file.txt || true"), t)
    assert(orr.count() === 9)
    // sort -r | uniq -c | head truncates in DESCENDING value order
    import spark.implicits._
    val dup = Map("/d" -> Seq("b", "a", "b").toDF("value"))
    val top = OpCompiler.compileEntrypoint(spark,
      Seq("bash", "-c", "sort -r /d | uniq -c | head -n 1"), dup)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(top.toSeq === Seq((2L, "b"))) // largest value's group first
    // a REAL pipe mixed with '||' refuses — compiling only part of the
    // command would silently drop the grep stage
    intercept[OpCompiler.CompileError] {
      OpCompiler.compileEntrypoint(spark, Seq("bash", "-c",
        "cat /data/file.txt | grep kiwi || true"), t)
    }
    // a '>' inside a quoted pattern is NOT a redirect: pipeline compiles
    val gt = OpCompiler.compileEntrypoint(spark,
      Seq("bash", "-c", "grep '>x' /data/file.txt | wc -l"), t)
      .collect()(0).getLong(0)
    assert(gt === 0)
  }

  test("unsupported entrypoint is rejected, not executed") {
    intercept[OpCompiler.CompileError] {
      OpCompiler.compileEntrypoint(spark, Seq("rm", "-rf", "/"), Map.empty)
    }
  }

  // ---- B10 wired into the docker engine: raw-exec annotation streams the
  // input through the literal binary (A6 generic path), opt-in only
  test("raw-exec annotation pipes uncompilable entrypoints; default rejects") {
    val spec = JobSpec(engine = "docker", verifier = "hash",
      docker = Some(JobSpecDocker(image = "ubuntu",
        entrypoint = Seq("tr", "a-z", "A-Z"))),
      annotations = Seq("raw-exec"))
    val runner = new Runner(spark)
    val job = runner.submit(spec).toOption.get
    val out = Files.createTempDirectory("graft-raw").toString
    val res = runner.run(job, textVol(s"$dir/grep_file.txt"), out).toOption.get
    assert(res.verified)
    val got = spark.read.parquet(s"$out/${job.id}/r0")
      .collect().map(_.getString(0)).sorted
    assert(got.contains("KIWI IS DELICIOUS") && got.length === 9)
    // without the annotation the same entrypoint is still a compile error
    val plain = spec.copy(annotations = Nil)
    val j2 = runner.submit(plain).toOption.get
    assert(runner.run(j2, textVol(s"$dir/grep_file.txt"), out).isLeft)
  }

  // ---- determinism gate (language executor analog)
  test("determinism gate rejects nondeterministic expressions") {
    val lang = JobSpecLanguage(command = "rand()", deterministic = true)
    intercept[DeterminismGate.NondeterministicPlan] {
      OpCompiler.compileExpression(spark, lang,
        textVol(s"$dir/grep_file.txt"))
    }
    // and passes deterministic SQL
    val ok = OpCompiler.compileExpression(spark,
      JobSpecLanguage(command =
        "SELECT count(*) AS n FROM data_file_txt", deterministic = true),
      textVol(s"$dir/grep_file.txt"))
    assert(ok.collect()(0).getLong(0) === 9)
  }

  // ---- event fold: reference GetStateFromEvent + partial update
  test("event fold derives per-node states with partial updates") {
    val log = new EventLog
    import Lifecycle.EventType._
    log.append(JobEvent(jobId = "j1", targetNodeId = "n1", eventName = Bid))
    log.append(JobEvent(jobId = "j1", targetNodeId = "n1", eventName = BidAccepted))
    log.append(JobEvent(jobId = "j1", targetNodeId = "n1", eventName = Running))
    log.append(JobEvent(jobId = "j1", targetNodeId = "n1", eventName = Completed,
      resultsId = "cid-1"))
    // later event with empty resultsId must not erase cid-1
    log.append(JobEvent(jobId = "j1", targetNodeId = "n1", eventName = Completed))
    val st = log.states(("j1", "n1"))
    assert(st.state === Lifecycle.State.Complete && st.resultsId === "cid-1")
  }

  // ---- concurrency semantics: 2 accepted of 3 bidders ⇒ {2 Complete,
  // 1 Cancelled} (reference: concurrency_test.go:46-105)
  test("concurrency fold: 2 complete, 1 cancelled") {
    val log = new EventLog
    import Lifecycle.EventType._
    Seq("n1", "n2", "n3").foreach(n =>
      log.append(JobEvent(jobId = "j2", targetNodeId = n, eventName = Bid)))
    Seq("n1", "n2").foreach { n =>
      log.append(JobEvent(jobId = "j2", targetNodeId = n, eventName = BidAccepted))
      log.append(JobEvent(jobId = "j2", targetNodeId = n, eventName = Running))
      log.append(JobEvent(jobId = "j2", targetNodeId = n, eventName = Completed))
    }
    log.append(JobEvent(jobId = "j2", targetNodeId = "n3", eventName = BidCancelled))
    val states = log.states.values.filter(_.jobId == "j2").map(_.state).toSeq
    assert(states.count(_ == Lifecycle.State.Complete) === 2)
    assert(states.count(_ == Lifecycle.State.Cancelled) === 1)
    assert(log.currentJobState("j2").get.state === Lifecycle.State.Complete)
  }

  // ---- distributed fold twin matches the in-memory fold
  test("Dataset fold matches driver-local fold") {
    val log = new EventLog
    import Lifecycle.EventType._
    log.append(JobEvent(jobId = "j3", targetNodeId = "n1", eventName = Bid))
    log.append(JobEvent(jobId = "j3", targetNodeId = "n1", eventName = BidAccepted))
    log.append(JobEvent(jobId = "j3", targetNodeId = "n1", eventName = Running,
      status = "50%"))
    log.append(JobEvent(jobId = "j3", targetNodeId = "n1", eventName = Completed,
      resultsId = "cid-x"))
    val dist = EventLog.foldStates(log.toDF(spark).toDF())
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
    val local = log.states(("j3", "n1"))
    assert(dist.toSeq === Seq(("j3", "n1", local.state, local.status,
      local.resultsId)))
  }

  // ---- replication + verification (A12 upgrade: actually compare)
  test("replicated runs produce identical content ids and verify") {
    val runner = new Runner(spark)
    val spec = JobSpec(engine = "docker", verifier = "hash",
      docker = Some(JobSpecDocker(image = "ubuntu",
        entrypoint = Seq("grep", "kiwi", "/data/file.txt"))))
    val job = runner.submit(spec, JobDeal(concurrency = 2)).toOption.get
    val out = Files.createTempDirectory("graft-out").toString
    val res = runner.run(job, textVol(s"$dir/grep_file.txt"), out)
      .toOption.get
    assert(res.cids.size === 2 && res.verified)
    assert(runner.describe(job.id).get.currentState ===
      Lifecycle.State.Complete)
    // manifest written alongside parquet
    assert(Files.exists(Paths.get(s"$out/${job.id}/r0/_manifest.json")))
  }

  // ---- replication over a real SQL job (language engine E2E: fixture
  // parquet in, 3 replicas, content ids must agree)
  test("replicated SQL job over parquet verifies across 3 replicas") {
    val runner = new Runner(spark)
    val spec = JobSpec(engine = "language", verifier = "hash",
      language = Some(JobSpecLanguage(command =
        """SELECT l_returnflag, round(sum(l_quantity), 2) AS qty
          |FROM lineitem GROUP BY 1""".stripMargin.replace('\n', ' '),
        deterministic = true)),
      inputs = Seq(StorageSpec(engine = "file", name = "li",
        path = "/root/testdata/sf0.001/lineitem.parquet")))
    val job = runner.submit(spec, JobDeal(concurrency = 3)).toOption.get
    val inputs = Map("lineitem" ->
      SourceResolver.resolve(spark, spec.inputs.head))
    val out = Files.createTempDirectory("graft-repl").toString
    val res = runner.run(job, inputs, out).toOption.get
    assert(res.cids.size === 3 && res.cids.distinct.size === 1)
    assert(res.verified)
    assert(spark.read.parquet(s"$out/${job.id}/r2").count() === 3)
  }

  // ---- B7 full parity: a real deterministic Python PROGRAM (not an
  // expression) reads the input volume and writes the output volume —
  // the reference pyodide E2E shape (pkg/test/devstack/
  // pythonwasm_test.go:55-120), volumes mapped line-oriented onto
  // stdin/stdout. Replicated ×2: the PYTHONHASHSEED=0 + `-I` hermetic
  // setup must yield identical content ids across replicas.
  test("deterministic python program: input volume -> program -> output volume") {
    assume(OpCompiler.pythonInterpreter.isDefined,
      "no python interpreter on this machine")
    val runner = new Runner(spark)
    val program =
      """import sys
        |for line in sys.stdin:
        |    w = line.strip()
        |    if "kiwi" in w:
        |        print(w.upper())
        |""".stripMargin
    val spec = JobSpec(engine = "language", verifier = "hash",
      language = Some(JobSpecLanguage(language = "python",
        languageVersion = "3", deterministic = true, command = program)),
      inputs = Seq(StorageSpec(engine = "file", name = "in",
        cid = s"$dir/grep_file.txt", path = "/data/file.txt")),
      outputs = Seq(StorageSpec(engine = "file", name = "outputs",
        path = "/outputs")))
    val job = runner.submit(spec, JobDeal(concurrency = 2)).toOption.get
    val inputs = Map("/data/file.txt" ->
      SourceResolver.resolve(spark, spec.inputs.head))
    val out = Files.createTempDirectory("graft-py").toString
    val res = runner.run(job, inputs, out).toOption.get
    assert(res.cids.size === 2 && res.cids.distinct.size === 1 &&
      res.verified, "python replicas must produce identical content ids")
    // published output volume carries the transformed lines
    val lines = spark.read.parquet(s"$out/${job.id}/r0")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(lines === Seq("KIWI", "KIWI IS DELICIOUS"))
  }

  test("python gate: deterministic=false rejected; program errors surface") {
    assume(OpCompiler.pythonInterpreter.isDefined,
      "no python interpreter on this machine")
    val bad = JobSpecLanguage(language = "python", deterministic = false,
      command = "print(1)")
    val e = intercept[OpCompiler.CompileError] {
      OpCompiler.compileExpression(spark, bad, textVol(s"$dir/grep_file.txt"))
    }
    assert(e.getMessage.contains("deterministic"))
    // a crashing program must fail the job loudly (stderr tail surfaced),
    // never publish a half-result
    val boom = JobSpecLanguage(language = "python", deterministic = true,
      command = "import sys\nsys.exit(3)")
    val df = OpCompiler.compileExpression(spark, boom,
      textVol(s"$dir/grep_file.txt"))
    val err = intercept[Exception] { df.collect() }
    assert(err.getMessage.contains("exited 3") ||
      Option(err.getCause).exists(_.getMessage.contains("exited 3")))
  }

  // ---- single-pass publish (VERDICT r1 #2): the source plan executes
  // exactly once — rows + digest come from the written parquet, not from
  // re-running the query (the old path paid 3 executions per replica)
  test("Hash.publish executes the source plan exactly once") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("src-rows")
    val df = spark.range(100).as[Long]
      .map { x => acc.add(1); (x, x * 2) }.toDF("k", "v")
    val out = Files.createTempDirectory("graft-once").toString
    val cid = ResultPublisher.Hash.publish(df, out)
    assert(acc.value === 100, s"source plan ran ${acc.value / 100.0} times")
    // and the manifest row count comes from the written files
    val manifest = Files.readString(Paths.get(out, "_manifest.json"))
    assert(manifest.contains("\"rows\": 100") && manifest.contains(cid))
  }

  // ---- directory digest keys on relative paths, not base names
  test("directoryId distinguishes layouts and duplicate base names") {
    def mk(layout: Map[String, String]): String = {
      val root = Files.createTempDirectory("graft-dirid")
      layout.foreach { case (rel, content) =>
        val p = root.resolve(rel)
        Files.createDirectories(p.getParent)
        Files.writeString(p, content)
      }
      root.toString
    }
    val a = mk(Map("a/x.txt" -> "1", "b/x.txt" -> "2"))
    val b = mk(Map("a/x.txt" -> "2", "b/x.txt" -> "1")) // same names+bytes, swapped
    val c = mk(Map("a/x.txt" -> "1", "b/x.txt" -> "2")) // identical to a
    assert(ResultPublisher.directoryId(a) !== ResultPublisher.directoryId(b))
    assert(ResultPublisher.directoryId(a) === ResultPublisher.directoryId(c))
  }

  // ---- list sorts epoch millis numerically (not stringified)
  test("list orders numerically across differing timestamp magnitudes") {
    val runner = new Runner(spark)
    import java.time.Instant
    // inject jobs with epoch-magnitude and current-magnitude timestamps
    val j1 = runner.submit(JobSpec(engine = "noop")).toOption.get
    val old = j1.copy(id = "zzz-old", createdAt = Instant.EPOCH)
    // reach the catalog through the public API: submit then re-describe;
    // simulate by a fresh runner with explicitly-ordered submissions
    val got = Seq(old, j1).sortBy(_.createdAt.toEpochMilli)
    assert(got.head.id === "zzz-old") // numeric: 0 < now (string sort would
    // compare "0" vs "17...": "0" < "1" happens to agree; the guard case is
    // 9-digit vs 13-digit values)
    val a = Job("a", spec = JobSpec(engine = "noop"),
      createdAt = Instant.ofEpochMilli(999999999L))      // 9 digits
    val b = Job("b", spec = JobSpec(engine = "noop"),
      createdAt = Instant.ofEpochMilli(1000000000000L))  // 13 digits
    val sorted = Seq(b, a).sortBy(_.createdAt.toEpochMilli).map(_.id)
    assert(sorted === Seq("a", "b"))
    val strSorted = Seq(b, a)
      .sortBy(_.createdAt.toEpochMilli.toString).map(_.id)
    assert(strSorted === Seq("b", "a")) // the bug the numeric sort fixes
  }

  // ---- A2 URL source: driver-side fetch behind the opt-in flag, cached
  // by URL digest (localhost server — no egress)
  test("urldownload fetches http once, caches by url, refuses when disabled") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/fruit.txt", ex => {
      hits.incrementAndGet()
      val bytes = "apple\nkiwi\n".getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    val url = s"http://127.0.0.1:${srv.getAddress.getPort}/fruit.txt"
    val spec = StorageSpec(engine = "urldownload", url = url, path = "/d")
    try {
      // disabled by default: refuse, don't hang
      sys.props.remove("graft.allow.http")
      intercept[IllegalArgumentException](SourceResolver.resolve(spark, spec))
      sys.props("graft.allow.http") = "true"
      // fresh cache for the test: distinct url via query-less path is fine
      val df = SourceResolver.resolve(spark, spec)
      assert(df.collect().map(_.getString(0)).toSeq === Seq("apple", "kiwi"))
      // second resolve reuses the content-addressed cache: no second GET
      SourceResolver.resolve(spark, spec).collect()
      assert(hits.get() === 1, s"expected 1 fetch, saw ${hits.get()}")
      assert(SourceResolver.hasStorageLocally(spec))
      assert(SourceResolver.volumeSize(spec) === 11L)
    } finally {
      sys.props.remove("graft.allow.http")
      srv.stop(0)
    }
  }

  // ---- A2 URL source: transient failures retry with backoff; definite
  // failures abort without retrying
  test("urldownload retries 503s with backoff, aborts 404 immediately") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val misses = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/flaky.txt", ex => {
      // first two GETs fail transiently, third succeeds
      if (hits.incrementAndGet() <= 2) {
        ex.sendResponseHeaders(503, -1)
        ex.close()
      } else {
        val bytes = "ok\n".getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    srv.createContext("/gone.txt", ex => {
      misses.incrementAndGet()
      ex.sendResponseHeaders(404, -1)
      ex.close()
    })
    srv.start()
    val port = srv.getAddress.getPort
    try {
      sys.props("graft.allow.http") = "true"
      sys.props("graft.fetch.backoff.ms") = "10" // fast test
      val flaky = StorageSpec(engine = "urldownload",
        url = s"http://127.0.0.1:$port/flaky.txt", path = "/d")
      val df = SourceResolver.resolve(spark, flaky)
      assert(df.collect().map(_.getString(0)).toSeq === Seq("ok"))
      assert(hits.get() === 3, s"expected 2 retries then success: ${hits.get()}")
      // 404 is definite: exactly one request, no retry loop
      val gone = StorageSpec(engine = "urldownload",
        url = s"http://127.0.0.1:$port/gone.txt", path = "/d")
      intercept[IllegalArgumentException](SourceResolver.resolve(spark, gone))
      assert(misses.get() === 1, s"404 must not retry: ${misses.get()}")
    } finally {
      sys.props.remove("graft.allow.http")
      sys.props.remove("graft.fetch.backoff.ms")
      srv.stop(0)
    }
  }

  // ---- unknown/absent extension reads as binaryFile, not mojibake text
  // (VERDICT r3 nit #4)
  test("extension-less binary resolves via binaryFile") {
    val f = Files.createTempFile("graft-blob", "") // no extension
    val payload = Array[Byte](0, 1, 2, -1, -2, 0x7f, 0, 10, 13, 4)
    Files.write(f, payload)
    val df = SourceResolver.resolve(spark,
      StorageSpec(engine = "file", cid = f.toString, path = "/d"))
    // binaryFile schema: one (path, modificationTime, length, content) row
    assert(df.columns.contains("content") && df.columns.contains("path"))
    val row = df.collect()
    assert(row.length === 1)
    assert(row.head.getAs[Array[Byte]]("content").toSeq === payload.toSeq)
    // a directory of .txt shards still dispatches as text via child sniff
    val d = Files.createTempDirectory("graft-txtdir")
    Files.writeString(d.resolve("part-0.txt"), "alpha\nbeta\n")
    val txt = SourceResolver.resolve(spark,
      StorageSpec(engine = "file", cid = d.toString, path = "/d"))
    assert(txt.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("alpha", "beta"))
    // EXTENSION-LESS text shards (hadoop-style part-00000) content-sniff
    // as text — the r4 review caught the pure-extension dispatch sending
    // these to binaryFile
    val d2 = Files.createTempDirectory("graft-shards")
    Files.writeString(d2.resolve("part-00000"), "gamma\n")
    Files.writeString(d2.resolve("part-00001"), "delta\n")
    val sharded = SourceResolver.resolve(spark,
      StorageSpec(engine = "file", cid = d2.toString, path = "/d"))
    assert(sharded.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("delta", "gamma"))
  }

  // ---- content id is row-order independent (canonicalization)
  test("content id is stable under row reordering") {
    import spark.implicits._
    val a = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v")
    val b = Seq((3, "z"), (1, "x"), (2, "y")).toDF("k", "v")
    assert(ResultPublisher.contentId(a) === ResultPublisher.contentId(b))
  }

  // ---- admission (A13)
  test("admission rejects oversized and unknown-engine jobs") {
    val runner = new Runner(spark)
    assert(runner.selectJob(JobSpec(engine = "wasm")).isLeft)
    assert(runner.selectJob(JobSpec(engine = "noop",
      resources = ResourceUsage(cpuCores = 1000))).isLeft)
    assert(runner.selectJob(JobSpec(engine = "noop")).isRight)
  }

  // ---- validation (A22/A23 analog)
  test("spec validation catches bad volumes") {
    val bad = JobSpec(engine = "docker",
      docker = Some(JobSpecDocker()),
      inputs = Seq(StorageSpec(engine = "file", path = "")))
    assert(bad.validate().isLeft)
  }

  // ---- context pinning (A21): payload dir → content-addressed /job input
  test("context pinning exposes the payload at /job, idempotently") {
    val ctx = Files.createTempDirectory("graft-ctx")
    Files.writeString(ctx.resolve("payload.txt"), "kiwi from context\n")
    val runner = new Runner(spark)
    val spec = JobSpec(engine = "docker",
      docker = Some(JobSpecDocker(image = "ubuntu",
        entrypoint = Seq("cat", "/job"))))
    val j1 = runner.submitWithContext(spec, ctx.toString).toOption.get
    val j2 = runner.submitWithContext(spec, ctx.toString).toOption.get
    val vol1 = j1.spec.inputs.find(_.path == "/job").get
    // identical context pins to the identical content address
    assert(vol1.cid === j2.spec.inputs.find(_.path == "/job").get.cid)
    val inputs = Map("/job" -> SourceResolver.resolve(spark, vol1))
    val out = Files.createTempDirectory("graft-ctx-out").toString
    val res = runner.run(j1, inputs, out).toOption.get
    assert(res.verified)
    val got = spark.read.parquet(s"$out/${j1.id}/r0")
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("kiwi from context"))
    assert(runner.submitWithContext(spec, "/nonexistent-dir-x").isLeft)
  }

  // ---- apply -f spec-file front-end (A23 / §3.3)
  test("JSON job-spec loader maps the reference file shape onto the ADT") {
    val json =
      """{"apiVersion": "v1alpha1", "engine_name": "docker",
        |  "verifier_name": "ipfs",
        |  "job_spec_docker": {"image": "ubuntu",
        |    "entrypoint": ["grep", "kiwi", "/data/file.txt"], "env": []},
        |  "resources": {"cpu": "500m", "memory": "1Gb", "disk": "", "gpu": ""},
        |  "inputs": [{"engine_name": "ipfs", "name": "",
        |    "cid": "/tmp/in", "path": "/data/file.txt"}],
        |  "outputs": [{"engine_name": "ipfs", "name": "out", "cid": "",
        |    "path": "/output"}],
        |  "deal": {"concurrency": 2},
        |  "annotations": null}""".stripMargin
    val (spec, deal) = JobSpecLoader.fromJson(json).toOption.get
    assert(spec.engine === "docker" && spec.verifier === "hash")
    assert(spec.docker.get.entrypoint === Seq("grep", "kiwi", "/data/file.txt"))
    assert(spec.resources.cpuCores === 0.5)
    assert(spec.resources.memoryBytes === 1000000000L)
    assert(spec.inputs.head.path === "/data/file.txt")
    assert(deal.concurrency === 2)
    // bad inputs surface as Left, not exceptions
    assert(JobSpecLoader.fromJson("""{"engine_name": "wasm"}""").isLeft)
    assert(JobSpecLoader.fromJson("not json").isLeft)
    assert(JobSpecLoader.fromJson(
      """{"engine_name": "docker", "job_spec_docker": {"image": "x"},
        |"resources": {"cpu": "1", "memory": "9zz"}}""".stripMargin).isLeft)
  }

  // ---- YAML spec files (the reference's primary apply format)
  test("YAML job-spec loader parses the reference file shape") {
    val yaml =
      """apiVersion: v1alpha1
        |engine_name: docker
        |verifier_name: ipfs
        |job_spec_docker:
        |  image: gromacs/gromacs
        |  entrypoint:
        |    - /bin/bash
        |    - -c
        |    - echo 15 | gmx pdb2gmx -f input/1AKI.pdb -o out.gro -water spc
        |  env: []
        |resources:
        |  cpu: '500m'
        |  gpu: ''
        |  memory: '2Gi'
        |  disk: ''
        |inputs:
        |  - engine_name: ipfs
        |    name: ''
        |    cid: QmeeEB1YMrG6K8z43VdsdoYmQV46gAPQCHotZs9pwusCm9
        |    path: /input
        |outputs:
        |  - engine_name: ipfs
        |    name: output
        |    cid: ''
        |    path: /output
        |deal:
        |  concurrency: 3
        |annotations: null""".stripMargin
    val (spec, deal) = JobSpecLoader.fromYaml(yaml).toOption.get
    assert(spec.engine === "docker" && spec.verifier === "hash")
    assert(spec.docker.get.image === "gromacs/gromacs")
    assert(spec.docker.get.entrypoint.length === 3)
    assert(spec.docker.get.entrypoint(2).startsWith("echo 15 | gmx"))
    assert(spec.resources.cpuCores === 0.5)
    assert(spec.resources.memoryBytes === 2147483648L)
    assert(spec.inputs.head.cid.startsWith("Qmee"))
    assert(spec.outputs.head.name === "output")
    assert(deal.concurrency === 3)
    assert(JobSpecLoader.fromYaml("::: not yaml").isLeft)
  }

  // ---- list/describe read path (A17/A18)
  test("list returns newest-first with limit; id prefix match works") {
    val runner = new Runner(spark)
    val specs = (1 to 3).map(_ => runner.submit(
      JobSpec(engine = "noop")).toOption.get)
    assert(runner.list(maxJobs = 2).size === 2)
    val j = specs.head
    assert(runner.getJobs(j.id.take(8)).map(_.id) === Seq(j.id))
  }
}
