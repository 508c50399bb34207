package graft.jobs

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the driver-side control plane (no Spark —
  * these run hundreds of generated cases per property):
  *
  *  - resource-string parsing is total on its documented grammar and
  *    monotone in the numeric part;
  *  - the EventLog fold matches an independently-written reference fold for
  *    arbitrary event sequences (partial-update rule included);
  *  - JobSpecLoader never throws on arbitrary input — malformed specs are
  *    Left, not exceptions.
  */
object GraftProps extends Properties("graft") {

  // ---- Resources ----------------------------------------------------

  private val unitGen = Gen.oneOf(
    ("kb", 1000L), ("mb", 1000L * 1000), ("gb", 1000L * 1000 * 1000),
    ("ki", 1024L), ("mi", 1024L * 1024), ("gi", 1024L * 1024 * 1024),
    ("kib", 1024L), ("mib", 1024L * 1024), ("gib", 1024L * 1024 * 1024))

  property("memory parsing = value × unit") =
    forAll(Gen.chooseNum(1, 1000000), unitGen) { (n, u) =>
      Resources.parseMemory(s"$n${u._1}") == n.toLong * u._2 &&
      Resources.parseMemory(s"$n${u._1.toUpperCase}") == n.toLong * u._2
    }

  property("cpu millicores = cores/1000") =
    forAll(Gen.chooseNum(1, 1000000)) { n =>
      math.abs(Resources.parseCpu(s"${n}m") - n / 1000.0) < 1e-12
    }

  property("defaults only fill absent values") =
    forAll(Gen.chooseNum(0.0, 64.0), Gen.chooseNum(0L, 1L << 40)) { (cpu, mem) =>
      val r = Resources.withDefaults(ResourceUsage(cpu, mem))
      (cpu <= 0 || r.cpuCores == cpu) && (mem <= 0 || r.memoryBytes == mem) &&
      r.cpuCores > 0 && r.memoryBytes > 0
    }

  // ---- EventLog fold vs independent reference model -----------------

  private val eventGen: Gen[JobEvent] = for {
    job <- Gen.oneOf("j1", "j2")
    node <- Gen.oneOf("n1", "n2", "n3")
    name <- Gen.oneOf(
      Lifecycle.EventType.Created, Lifecycle.EventType.Bid,
      Lifecycle.EventType.BidAccepted, Lifecycle.EventType.BidRejected,
      Lifecycle.EventType.BidCancelled, Lifecycle.EventType.Running,
      Lifecycle.EventType.Completed, Lifecycle.EventType.Error)
    status <- Gen.oneOf("", "s1", "s2")
    results <- Gen.oneOf("", "cid-a", "cid-b")
  } yield JobEvent(jobId = job, targetNodeId = node, eventName = name,
    status = status, resultsId = results)

  property("event fold matches reference model (partial updates kept)") =
    forAll(Gen.listOfN(40, eventGen)) { evs =>
      val log = new EventLog
      evs.foreach(log.append)
      // independent model: left fold keeping last non-empty status/results
      val model = evs.foldLeft(Map.empty[(String, String), (String, String, String)]) {
        case (m, e) =>
          Lifecycle.stateFromEvent(e.eventName) match {
            case None => m
            case Some(st) =>
              val k = (e.jobId, e.targetNodeId)
              val (_, ps, pr) = m.getOrElse(k, ("", "", ""))
              m.updated(k, (st,
                if (e.status.nonEmpty) e.status else ps,
                if (e.resultsId.nonEmpty) e.resultsId else pr))
          }
      }
      val folded = log.states.map { case (k, v) =>
        k -> (v.state, v.status, v.resultsId) }
      Prop(folded == model) :| s"fold=$folded model=$model"
    }

  property("currentJobState picks max progress, never BidRejected") =
    forAll(Gen.listOfN(25, eventGen)) { evs =>
      val log = new EventLog
      evs.foreach(log.append)
      log.currentJobState("j1") match {
        case None => Prop(log.states.keys.forall(_._1 != "j1") ||
          log.states.collect { case ((j, _), s) if j == "j1" => s.state }
            .forall(_ == Lifecycle.State.BidRejected))
        case Some(s) =>
          val candidates = log.states.values
            .filter(x => x.jobId == "j1" && x.state != Lifecycle.State.BidRejected)
          Prop(s.state != Lifecycle.State.BidRejected &&
            candidates.forall(c =>
              Lifecycle.progressRank(c.state) <= Lifecycle.progressRank(s.state)))
      }
    }

  // ---- JobSpecLoader totality ---------------------------------------

  property("loader never throws: junk input yields Left") =
    forAll(Gen.asciiPrintableStr) { junk =>
      JobSpecLoader.fromJson(junk).isLeft || JobSpecLoader.fromJson(junk).isRight
    }

  property("loader round-trips minimal docker specs") =
    forAll(Gen.oneOf("docker", "language", "noop"),
           Gen.chooseNum(1, 9)) { (engine, conc) =>
      val payload = engine match {
        case "docker" => """"job_spec_docker": {"image": "x",
          "entrypoint": ["cat", "/f"]},"""
        case "language" => """"job_spec_language": {"command": "SELECT 1"},"""
        case _ => ""
      }
      val json =
        s"""{"engine_name": "$engine", "verifier_name": "noop", $payload
           |"deal": {"concurrency": $conc}}""".stripMargin
      JobSpecLoader.fromJson(json) match {
        case Right((spec, deal)) =>
          Prop(spec.engine == engine && deal.concurrency == conc)
        case Left(e) => Prop(false) :| s"unexpected Left($e)"
      }
    }

  // ---- entrypoint command parsing (OpCompiler) ----------------------

  private val plainToken: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('.', '/', '-')))
      .map(_.mkString)

  property("tokenizeCmd on quote-free input = whitespace split") =
    forAll(Gen.nonEmptyListOf(plainToken)) { tokens =>
      OpCompiler.tokenizeCmd(tokens.mkString(" ")) == tokens
    }

  property("tokenizeCmd strips single quotes, preserving inner spaces") =
    forAll(Gen.nonEmptyListOf(Gen.nonEmptyListOf(plainToken)
      .map(_.mkString(" ")))) { quoted =>
      val cmd = quoted.map(q => s"'$q'").mkString(" ")
      OpCompiler.tokenizeCmd(cmd) == quoted
    }

  property("splitTopLevelPipes round-trips unquoted stage lists") =
    forAll(Gen.chooseNum(2, 5).flatMap(n =>
      Gen.listOfN(n, Gen.nonEmptyListOf(plainToken).map(_.mkString(" "))))) {
      stages =>
        OpCompiler.splitTopLevelPipes(stages.mkString(" | "))
          .contains(stages)
    }

  property("pipes inside single quotes never split") =
    forAll(plainToken, plainToken) { (a, b) =>
      OpCompiler.splitTopLevelPipes(s"grep '$a|$b' /f").isEmpty
    }

  // ---- BRE → Java translation ---------------------------------------

  property("breToJava: metachar-free patterns pass through unchanged") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)) { s =>
      OpCompiler.breToJava(s) == s
    }

  property("breToJava: BRE-literal +?(){}| match themselves in Java") =
    forAll(Gen.oneOf('+', '?', '(', ')', '{', '}', '|'),
           Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)) { (m, s) =>
      val pat = s + m
      java.util.regex.Pattern.compile(OpCompiler.breToJava(pat))
        .matcher(pat).find()
    }

  property("breToJava: shared metachars . * ^ $ keep regex meaning") =
    forAll(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)) { s =>
      java.util.regex.Pattern.compile(OpCompiler.breToJava(s"^$s.*$$"))
        .matcher(s + "xyz").find()
    }

  // ---- tr range expansion -------------------------------------------

  property("expandTrRanges: range-free strings pass through") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)) { s =>
      OpCompiler.expandTrRanges(s) == s
    }

  property("expandTrRanges covers every char of an a-b range") =
    forAll(Gen.alphaLowerChar, Gen.alphaLowerChar) { (x, y) =>
      val (lo, hi) = if (x <= y) (x, y) else (y, x)
      val out = OpCompiler.expandTrRanges(s"$lo-$hi")
      (lo to hi).forall(out.contains(_)) && out.length == (hi - lo + 1)
    }

  // ---- submit signing (ClientKeys) ----------------------------------
  // Two identities generated once (RSA keygen is ~100ms); properties vary
  // the payload, not the key.

  private lazy val idA = ClientKeys.loadOrCreate(
    java.nio.file.Files.createTempDirectory("graft-prop-ka"))
  private lazy val idB = ClientKeys.loadOrCreate(
    java.nio.file.Files.createTempDirectory("graft-prop-kb"))

  private val payloadGen: Gen[Array[Byte]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)

  property("sign/verify round-trips under the signer's key only") =
    forAll(payloadGen) { msg =>
      val sig = ClientKeys.sign(idA, msg)
      ClientKeys.verify(msg, sig, idA.publicKeyB64) &&
      !ClientKeys.verify(msg, sig, idB.publicKeyB64)
    }

  property("any payload change invalidates the signature") =
    forAll(payloadGen, Gen.chooseNum(0, 1 << 20)) { (msg, flipSeed) =>
      val sig = ClientKeys.sign(idA, msg)
      val i = flipSeed % msg.length
      val tampered = msg.clone()
      tampered(i) = (tampered(i) ^ 0x01).toByte
      !ClientKeys.verify(tampered, sig, idA.publicKeyB64)
    }

  property("client ids bind to their keys and never cross-match") =
    Prop(idA.clientId.matches("[0-9a-f]{64}") &&
      ClientKeys.publicKeyMatchesId(idA.publicKeyB64, idA.clientId) &&
      ClientKeys.publicKeyMatchesId(idB.publicKeyB64, idB.clientId) &&
      !ClientKeys.publicKeyMatchesId(idA.publicKeyB64, idB.clientId))

  property("verify is total: garbage signatures/keys are false, not thrown") =
    forAll(payloadGen, Gen.asciiPrintableStr, Gen.asciiPrintableStr) {
      (msg, sig, key) =>
        ClientKeys.verify(msg, sig, key) == false ||
          ClientKeys.verify(msg, sig, key) == true
    }

  // ---- directory digest (ResultPublisher) ---------------------------

  property("directoryId is layout-content determined, creation-order free") =
    forAll(Gen.chooseNum(1, 6), Gen.chooseNum(0L, 1000000L)) { (nFiles, seed) =>
      import java.nio.file.{Files, Paths}
      val names = (0 until nFiles).map(i => s"sub$i/f$i.txt")
      def mk(order: Seq[Int]): String = {
        val root = Files.createTempDirectory("graft-prop-dir")
        order.foreach { i =>
          val p = root.resolve(names(i))
          Files.createDirectories(p.getParent)
          Files.writeString(p, s"content-$seed-$i")
        }
        root.toString
      }
      val fwd = mk(0 until nFiles)
      val rev = mk((0 until nFiles).reverse)
      ResultPublisher.directoryId(fwd) == ResultPublisher.directoryId(rev)
    }
}
