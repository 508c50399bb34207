package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

/** A23 arg-built specs — mirrors the reference's CLI construction cases
  * (cmd/bacalhau/docker_run_test.go: TestRun_SubmitInputs/SubmitUrlInputs/
  * SubmitOutputs/SubmitLabels; pkg/job/job.go:18-142). */
class JobSpecBuilderSpec extends AnyFunSuite {

  private def docker(args: (String, Any)*): Either[String, JobSpecBuilder.Built] = {
    val m = args.toMap
    JobSpecBuilder.constructDockerJob(
      image = m.getOrElse("image", "ubuntu").asInstanceOf[String],
      entrypoint = m.getOrElse("entrypoint", Seq("echo", "hello"))
        .asInstanceOf[Seq[String]],
      cpu = m.getOrElse("cpu", "").asInstanceOf[String],
      gpu = m.getOrElse("gpu", "").asInstanceOf[String],
      inputUrls = m.getOrElse("urls", Nil).asInstanceOf[Seq[String]],
      inputVolumes = m.getOrElse("vols", Nil).asInstanceOf[Seq[String]],
      outputVolumes = m.getOrElse("outs", Nil).asInstanceOf[Seq[String]],
      concurrency = m.getOrElse("concurrency", 1).asInstanceOf[Int],
      annotations = m.getOrElse("labels", Nil).asInstanceOf[Seq[String]],
      workingDir = m.getOrElse("workdir", "").asInstanceOf[String])
  }

  // TestRun_SubmitInputs: bare -i CID defaults to /inputs; -v CID:path
  // mounts at the given path; multiple volumes all land in the spec
  test("input volumes: bare cid defaults to /inputs; cid:path mounts there") {
    val b = docker("vols" -> Seq(
      "QmZUCdf9ZdpbHd", // bare
      "QmZUCdf9ZdpbHe:/CUSTOM_INPUT_PATH_1",
      "/local/path/file.txt:/data/file.txt" // path-addressed (engine ext.)
    )).toOption.get
    val ins = b.spec.inputs
    assert(ins.length === 3)
    assert(ins(0).cid === "QmZUCdf9ZdpbHd" && ins(0).path === "/inputs")
    assert(ins(1).path === "/CUSTOM_INPUT_PATH_1")
    assert(ins(2).cid === "/local/path/file.txt" &&
      ins(2).path === "/data/file.txt")
  }

  // TestRun_SubmitUrlInputs: split at the LAST ':' (ports survive)
  test("input urls split at last colon; scheme whitelist enforced") {
    val b = docker("urls" -> Seq(
      "http://foo.com:8080/bar.tar.gz:/app/data.tar.gz",
      "https://qaz.edu/sam.zip:/app/sam.zip")).toOption.get
    assert(b.spec.inputs.map(_.url) === Seq(
      "http://foo.com:8080/bar.tar.gz", "https://qaz.edu/sam.zip"))
    assert(b.spec.inputs.map(_.path) === Seq("/app/data.tar.gz", "/app/sam.zip"))
    assert(docker("urls" -> Seq("ftp://x/y:/app/z")).isLeft)
    assert(docker("urls" -> Seq("http://no-path.com/f")).isLeft)
  }

  // TestRun_SubmitOutputs: default outputs:/outputs always appended;
  // one-part volumes are invalid
  test("outputs: default outputs:/outputs appended; invalid forms rejected") {
    assert(docker().toOption.get.spec.outputs.map(o => (o.name, o.path)) ===
      Seq(("outputs", "/outputs")))
    val two = docker("outs" -> Seq("OUTPUT_NAME:/outputs_1")).toOption.get
    assert(two.spec.outputs.length === 2)
    assert(two.spec.outputs.head.name === "OUTPUT_NAME")
    val err = docker("outs" -> Seq("OUTPUT_NAME_4"))
    assert(err.isLeft && err.swap.toOption.get.contains("invalid output volume"))
    assert(docker("outs" -> Seq(":/outputs_4")).isLeft)
  }

  // TestRun_SubmitLabels analog: unsafe annotations dropped with warning
  test("unsafe annotations are dropped, safe ones kept") {
    val b = docker("labels" -> Seq("safe-label", "ok._~!:@,;+-",
      "bad label with spaces", "")).toOption.get
    assert(b.spec.annotations === Seq("safe-label", "ok._~!:@,;+-"))
    assert(b.warnings.exists(_.contains("bad label with spaces")))
  }

  test("concurrency must be >= 1; workdir must be absolute; gpu count kept") {
    assert(docker("concurrency" -> 0).isLeft)
    assert(docker("workdir" -> "../relative").isLeft)
    assert(docker("workdir" -> "/abs/ok").isRight)
    assert(docker("gpu" -> "1").toOption.get.spec.resources.gpus === 1)
  }

  // A22 front-end: syntax errors caught at construction (pre-submit), not run
  test("entrypoint syntax check: unbalanced quote fails, skip flag bypasses") {
    val bad = Seq("sh", "-c", "echo 'unterminated")
    assert(docker("entrypoint" -> bad).isLeft)
    assert(JobSpecBuilder.constructDockerJob(image = "ubuntu",
      entrypoint = bad, skipSyntaxCheck = true).isRight)
    assert(docker("entrypoint" -> Seq("sh", "-c", "cat f |")).isLeft)
    // glob without shell: non-fatal warning (SanitizeImageAndEntrypoint)
    val w = docker("entrypoint" -> Seq("cat", "*.txt")).toOption.get
    assert(w.warnings.exists(_.contains("glob")))
    assert(docker("entrypoint" ->
      Seq("/bin/bash", "-c", "cat *.txt")).toOption.get.warnings.isEmpty)
  }

  test("language job: volumes parse; empty command rejected") {
    val b = JobSpecBuilder.constructLanguageJob(
      command = "SELECT 1 AS one",
      inputVolumes = Seq("/tmp/t.parquet:/t")).toOption.get
    assert(b.spec.engine === "language")
    assert(b.spec.language.get.deterministic)
    assert(b.spec.inputs.head.path === "/t")
    assert(JobSpecBuilder.constructLanguageJob(command = "").isLeft)
    assert(JobSpecBuilder.constructLanguageJob(command = "SELECT 1",
      concurrency = 0).isLeft)
  }

  test("bash syntax checker accepts real-world entrypoints") {
    import ScriptChecker.checkBashSyntax
    assert(checkBashSyntax(Seq("bash", "-c",
      "echo 15 | gmx pdb2gmx -f input/1AKI.pdb -o out.gro -water spc")).isRight)
    assert(checkBashSyntax(Seq("sed", "-n", "/38.7[2-4]..,-9.1[3-7]../p",
      "/data/file.txt")).isRight)
    assert(checkBashSyntax(Seq("awk", "-F,",
      "{x=38.7077507-$3; y=-9.1365919-$4; if(x^2+y^2<0.3^2) print $0}",
      "/data/file.csv")).isRight)
    assert(checkBashSyntax(Seq("sh", "-c", "f() { echo hi; }; f")).isRight)
    // unclosed group command is caught pre-submit; literal/awk braces and
    // ${var} expansions stay legal
    assert(checkBashSyntax(Seq("sh", "-c", "f() { echo hi")).isLeft)
    assert(checkBashSyntax(Seq("echo", "${HOME}and{1..3}")).isRight)
    // mid-word '{ ' is a literal, not a group opener
    assert(checkBashSyntax(Seq("echo", "a{ b")).isRight)
  }
}
