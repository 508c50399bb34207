package graft.jobs

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** HTTP control-plane spec: submit + poll a job through a real socket
  * (reference: pkg/test/devstack/submit_test.go + publicapi client tests).
  * The client and server share nothing but the TCP connection. */
class ApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private var server: ApiServer = _
  private var client: ApiClient = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("graft-api").toString
    Files.writeString(Paths.get(s"$dir/fruit.txt"),
      Seq("apple", "kiwi", "cherry", "kiwi is delicious")
        .mkString("", "\n", "\n"))
    server = new ApiServer(spark, dir)
    server.start()
    client = new ApiClient(server.uri)
  }

  override def afterAll(): Unit = {
    server.stop()
    spark.stop()
  }

  test("health and version endpoints answer") {
    val http = java.net.http.HttpClient.newHttpClient()
    def get(path: String): String = http.send(
      java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"${server.uri}$path")).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    assert(get("/healthz").contains("OK"))
    assert(get("/livez").contains("OK"))
    assert(get("/version").contains("gitversion"))
    assert(get("/version").contains(graft.jobs.GraftVersion.GitVersion))
    assert(get("/id").contains("spark-local"))
  }

  test("submit over the socket, poll states to Complete, fetch events") {
    val spec =
      s"""{"engine_name": "docker", "verifier_name": "ipfs",
         |  "job_spec_docker": {"image": "ubuntu",
         |    "entrypoint": ["grep", "kiwi", "/data/file.txt"]},
         |  "inputs": [{"engine_name": "ipfs", "name": "in",
         |    "cid": "$dir/fruit.txt", "path": "/data/file.txt"}],
         |  "deal": {"concurrency": 2}}""".stripMargin
    val jobId = client.submit(spec)
    assert(jobId.matches("[0-9a-f-]{36}"))
    assert(client.waitForJob(jobId), "job did not reach a terminal state")
    val states = client.states(jobId)
    assert(states.size === 2) // one per replica
    assert(states.forall(_._2 === Lifecycle.State.Complete))
    assert(states.map(_._3).distinct.size === 1) // replicas hash-agree
    val evts = client.events(jobId)
    assert(evts.head === Lifecycle.EventType.Created)
    assert(evts.count(_ == Lifecycle.EventType.Completed) === 2)
    // results written under the server's state dir
    val parquet = spark.read.parquet(s"$dir/results/$jobId/r0")
    assert(parquet.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("kiwi", "kiwi is delicious"))
  }

  test("client id-prefix semantics match the reference (dash-stripped)") {
    val spec =
      """{"engine_name": "noop", "verifier_name": "noop"}"""
    val jobId = client.submit(spec)
    // prefix with dashes stripped, mixed case
    val prefix = jobId.replace("-", "").take(12).toUpperCase
    assert(client.get(prefix) === Some(jobId))
    assert(client.get("zzzzzzzz") === None)
  }

  test("bad submissions get a 400 with an error body, not a hang") {
    val ex = intercept[RuntimeException] {
      client.submit("""{"engine_name": "wasm"}""")
    }
    assert(ex.getMessage.contains("unknown engine_name"))
    val ex2 = intercept[RuntimeException] {
      client.submit("""{"engine_name": "docker"}""")
    }
    assert(ex2.getMessage.contains("docker engine without docker spec"))
  }

  // ---- submit-payload signing (reference verifySubmitRequest,
  // pkg/publicapi/server.go:411-444): unsigned, impersonated and tampered
  // submits are all 400s; the signed path is every other test in this suite.
  test("unsigned, impersonated, and tampered submits are rejected") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val http = java.net.http.HttpClient.newHttpClient()
    def post(body: String): (Int, String) = {
      val resp = http.send(java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"${server.uri}/submit"))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    val keyDir = Files.createTempDirectory("graft-keys-a")
    val id = ClientKeys.loadOrCreate(keyDir)
    val spec = """{"engine_name": "noop", "verifier_name": "noop"}"""
    val data = mapper.readTree(spec)
    val dataBytes = mapper.writeValueAsBytes(data)
    def envelope(clientId: String, sig: String, pub: String): String = {
      val n = mapper.createObjectNode()
      n.put("client_id", clientId)
      n.set[com.fasterxml.jackson.databind.JsonNode]("data", mapper.readTree(spec))
      if (sig.nonEmpty) n.put("signature", sig)
      if (pub.nonEmpty) n.put("client_public_key", pub)
      mapper.writeValueAsString(n)
    }
    // no signature at all
    val (c1, b1) = post(envelope(id.clientId, "", id.publicKeyB64))
    assert(c1 === 400 && b1.contains("signature is required"))
    // valid signature from key A, but claiming key B's client id
    val other = ClientKeys.loadOrCreate(Files.createTempDirectory("graft-keys-b"))
    val (c2, b2) = post(envelope(other.clientId,
      ClientKeys.sign(id, dataBytes), id.publicKeyB64))
    assert(c2 === 400 && b2.contains("does not match client ID"))
    // correct key/id binding, but the signed bytes differ from the payload
    val tampered = mapper.writeValueAsBytes(
      mapper.readTree("""{"engine_name": "docker", "verifier_name": "noop"}"""))
    val (c3, b3) = post(envelope(id.clientId,
      ClientKeys.sign(id, tampered), id.publicKeyB64))
    assert(c3 === 400 && b3.contains("signature is invalid"))
    // the well-signed version of the same envelope is accepted
    val (c4, b4) = post(envelope(id.clientId,
      ClientKeys.sign(id, dataBytes), id.publicKeyB64))
    assert(c4 === 200 && b4.contains("\"job\""), b4)
  }

  test("client identity is stable across reloads and binds to its id") {
    val keyDir = Files.createTempDirectory("graft-keys-c")
    val a = ClientKeys.loadOrCreate(keyDir)
    val b = ClientKeys.loadOrCreate(keyDir) // reload from PEM
    assert(a.clientId === b.clientId)
    assert(a.clientId.matches("[0-9a-f]{64}"))
    assert(ClientKeys.publicKeyMatchesId(a.publicKeyB64, a.clientId))
    val msg = "payload".getBytes("UTF-8")
    assert(ClientKeys.verify(msg, ClientKeys.sign(b, msg), a.publicKeyB64))
    assert(!ClientKeys.verify("other".getBytes("UTF-8"),
      ClientKeys.sign(b, msg), a.publicKeyB64))
  }

  test("server version envelope reaches the client") {
    val v = client.version()
    assert(v.get("gitversion").asText() === GraftVersion.GitVersion)
    assert(v.get("major").asText() === GraftVersion.Major)
  }

  test("unresolvable inputs reach a terminal Error state, not a silent hang") {
    val spec =
      """{"engine_name": "docker", "verifier_name": "ipfs",
        |  "job_spec_docker": {"image": "ubuntu",
        |    "entrypoint": ["cat", "/data/file.txt"]},
        |  "inputs": [{"engine_name": "ipfs", "name": "in",
        |    "cid": "/no/such/fixture-path", "path": "/data/file.txt"}]}"""
        .stripMargin
    val jobId = client.submit(spec)
    assert(client.waitForJob(jobId, timeoutMs = 20000),
      "job with a bad input never reached a terminal state")
    val evts = client.events(jobId)
    assert(evts.contains(Lifecycle.EventType.Error))
  }

  test("results download over the socket; traversal rejected") {
    val spec =
      s"""{"engine_name": "docker", "verifier_name": "ipfs",
         |  "job_spec_docker": {"image": "ubuntu",
         |    "entrypoint": ["grep", "kiwi", "/data/file.txt"]},
         |  "inputs": [{"engine_name": "ipfs", "name": "in",
         |    "cid": "$dir/fruit.txt", "path": "/data/file.txt"}]}"""
        .stripMargin
    val jobId = client.submit(spec)
    assert(client.waitForJob(jobId))
    val out = Files.createTempDirectory("graft-fetch").toString
    val files = client.getResults(jobId, out)
    assert(files.nonEmpty, "no result files downloaded")
    val parquet = spark.read.parquet(s"$out/$jobId/r0")
    assert(parquet.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("kiwi", "kiwi is delicious"))
    // traversal attempts are 400s, never file reads outside the replica
    val http = java.net.http.HttpClient.newHttpClient()
    for (bad <- Seq(
        s"job_id=$jobId&replica=r0&path=..%2F..%2F..%2Fevents.jsonl",
        s"job_id=..&replica=r0&path=x",
        s"job_id=$jobId&replica=..%2F..&path=x")) {
      val resp = http.send(java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"${server.uri}/results/file?$bad"))
        .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 400, s"$bad -> ${resp.statusCode()}")
    }
    // the LISTING endpoint applies the same gate — "../.." must not walk
    // (and disclose) trees outside the results dir
    val listResp = http.send(java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"${server.uri}/results"))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        """{"job_id": "../.."}""")).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    assert(listResp.statusCode() === 400, listResp.body())
  }

  test("admission-rejected jobs reach a terminal state promptly") {
    // cpu beyond the runner ceiling → BidRejected; waitForJob must treat
    // that as terminal instead of polling out the whole timeout
    val jobId = client.submit(
      """{"engine_name": "noop", "verifier_name": "noop",
        |  "resources": {"cpu": "1000", "memory": "", "disk": "", "gpu": ""}}"""
        .stripMargin)
    val t0 = System.currentTimeMillis()
    assert(client.waitForJob(jobId, timeoutMs = 20000),
      "rejected job never reached a terminal state")
    assert(System.currentTimeMillis() - t0 < 15000, "terminality was slow")
    assert(client.states(jobId).map(_._2)
      .contains(Lifecycle.State.BidRejected))
  }

  test("list over the socket sees all submitted jobs") {
    val before = client.list().size
    client.submit("""{"engine_name": "noop", "verifier_name": "noop"}""")
    assert(client.list().size === before + 1)
  }
}
