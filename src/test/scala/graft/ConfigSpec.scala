package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Config

/** The config/env-override layer against the reference's precedence table
  * (config_parser.py:34-105): inline APP_CONFIG beats the settings text,
  * APP_* network vars beat the arguments, APP_MONGO_* rewrite the chosen
  * base, and every missing mandatory input fails with the reference's
  * guidance. Pure-function vectors — no files, no process env. */
class ConfigSpec extends AnyFunSuite {

  private val settings =
    """{
      |  "mongo": {"uri": "mongodb://localhost:27017/", "db": "moc-alpha-testnet"},
      |  "debug": true,
      |  "tasks": {"scan_moc_blocks": {"interval": 3},
      |            "reconnect_on_lost_chain": {"interval": 180}},
      |  "networks": {
      |    "mocTestnetAlpha": {
      |      "app_mode": "MoC",
      |      "addresses": {"MoC": "0x01AD", "Multicall2": "0xaf7b"}}}
      |}""".stripMargin

  test("base resolution: file text + explicit networks") {
    val r = Config.resolve(Map.empty, Some(settings),
      connectionNetwork = Some("rskTestnetPublic"),
      configNetwork = Some("mocTestnetAlpha"))
    assert(r.connectionNetwork === "rskTestnetPublic")
    assert(r.configNetwork === "mocTestnetAlpha")
    assert(r.storeUri === "mongodb://localhost:27017/")
    assert(r.storeDb === "moc-alpha-testnet")
    assert(r.debug)
    assert(r.taskIntervalSeconds("scan_moc_blocks") === Some(3))
    assert(r.taskIntervalSeconds("reconnect_on_lost_chain") === Some(180))
    assert(r.taskIntervalSeconds("nope") === None)
    assert(r.appMode === "MoC")
    assert(r.address("MoC") === Some("0x01AD"))
    assert(r.address("BProToken") === None) // optional, like tasks.py:179
  }

  test("env overrides beat every argument (config_parser.py:49,69,84)") {
    val inline = """{"mongo":{"uri":"u2","db":"d2"},"networks":{"n2":{"app_mode":"RRC20"}}}"""
    val r = Config.resolve(
      Map("APP_CONFIG" -> inline,
        "APP_CONNECTION_NETWORK" -> "rskMainnet",
        "APP_CONFIG_NETWORK" -> "n2"),
      Some(settings), Some("ignored"), Some("ignored"))
    assert(r.storeDb === "d2", "APP_CONFIG must beat the settings text")
    assert(r.connectionNetwork === "rskMainnet")
    assert(r.configNetwork === "n2")
    assert(r.appMode === "RRC20")
  }

  test("APP_MONGO_* rewrite the chosen base after selection (config_parser.py:99-105)") {
    val r = Config.resolve(
      Map("APP_MONGO_URI" -> "mongodb://prod:27017/", "APP_MONGO_DB" -> "prod-db"),
      Some(settings), Some("rsk"), Some("mocTestnetAlpha"))
    assert(r.storeUri === "mongodb://prod:27017/")
    assert(r.storeDb === "prod-db")
    assert(r.debug, "override must not drop unrelated settings")
    // and they also rewrite an inline APP_CONFIG base
    val r2 = Config.resolve(
      Map("APP_CONFIG" -> """{"mongo":{"uri":"u","db":"d"}}""",
        "APP_MONGO_DB" -> "d3"),
      None, Some("rsk"), Some("n"))
    assert(r2.storeDb === "d3" && r2.storeUri === "u")
  }

  test("missing mandatory inputs fail with the reference's guidance") {
    val noCfg = intercept[IllegalArgumentException] {
      Config.resolve(Map.empty, None, Some("rsk"), Some("n"))
    }
    assert(noCfg.getMessage.contains("APP_CONFIG"))
    val noConn = intercept[IllegalArgumentException] {
      Config.resolve(Map.empty, Some(settings), None, Some("n"))
    }
    assert(noConn.getMessage.contains("APP_CONNECTION_NETWORK"))
    val noNet = intercept[IllegalArgumentException] {
      Config.resolve(Map.empty, Some(settings), Some("rsk"), None)
    }
    assert(noNet.getMessage.contains("APP_CONFIG_NETWORK"))
    // a typo'd network name fails at first network-scoped read
    val r = Config.resolve(Map.empty, Some(settings), Some("rsk"), Some("typo"))
    intercept[IllegalArgumentException](r.appMode)
    // APP_MONGO_* against a doc without a mongo block fails like KeyError
    intercept[IllegalArgumentException] {
      Config.resolve(Map("APP_MONGO_URI" -> "u"),
        Some("""{"networks":{}}"""), Some("rsk"), Some("n"))
    }
  }

  test("entry points consume the resolved config") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.Triggers
    val r = Config.resolve(Map.empty, Some(settings), Some("rsk"), Some("mocTestnetAlpha"))
    assert(Triggers.forTask(r, "scan_moc_blocks", Triggers.Events) ===
      Trigger.ProcessingTime("3 seconds"))
    assert(Triggers.forTask(r, "scan_moc_events", Triggers.Events) === Triggers.Events,
      "absent task falls back to the pinned default")
    // ApiServer.fromConfig maps the store db to the dataset root
    val api = graft.serving.ApiServer.fromConfig(SparkTestSession.spark, r)
    assert(api != null)
  }
}
