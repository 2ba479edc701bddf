package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** App-shell configuration — the reference's ConfigParser
  * (config_parser.py:34-105, identical in webservice/config_parser.py)
  * re-expressed as a PURE function over explicit inputs: a JSON settings
  * document, two network names, and an env map. No global state and no
  * hidden file reads, so every precedence rule is unit-testable with
  * plain maps (ConfigSpec); the entry points pass `sys.env` and the file
  * contents.
  *
  * Precedence, exactly the reference's:
  *   - `APP_CONFIG` (inline JSON in env) beats the provided settings text;
  *     neither present → error (config_parser.py:49-67)
  *   - `APP_CONNECTION_NETWORK` beats the connectionNetwork argument
  *     (config_parser.py:69-82)
  *   - `APP_CONFIG_NETWORK` beats the configNetwork argument
  *     (config_parser.py:84-97)
  *   - `APP_MONGO_URI` / `APP_MONGO_DB` override `config.mongo.uri` /
  *     `config.mongo.db` after the base is chosen (config_parser.py:99-105)
  */
object Config {

  /** the merged settings document plus the two selected network names —
    * what the reference calls (config, connection_network, config_network).
    * Typed accessors mirror the fields the reference's tasks actually read. */
  final case class Resolved(
      config: JValue,
      connectionNetwork: String,
      configNetwork: String) {

    private def str(v: JValue, what: String): String = v match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(
        s"settings: $what missing or not a string (got $other)")
    }

    /** config.mongo.uri / config.mongo.db — the document-store address; the
      * parquet profile reads `storeDb` as its dataset root directory. */
    def storeUri: String = str(config \ "mongo" \ "uri", "mongo.uri")
    def storeDb: String = str(config \ "mongo" \ "db", "mongo.db")

    def debug: Boolean = config \ "debug" match {
      case JBool(b) => b
      case _ => false
    }

    /** tasks.<name>.interval in seconds (settings-*.json `tasks` block). */
    def taskIntervalSeconds(task: String): Option[Int] =
      config \ "tasks" \ task \ "interval" match {
        case JInt(n) => Some(n.toInt)
        case JDouble(d) => Some(d.toInt)
        case _ => None
      }

    /** indexer.history_retain (round 12): newest-N bound on the
      * `moc_indexer_history` audit trail (Pipelines.advanceCursor knob).
      * Absent → append-only, the reference's parity default. */
    def historyRetain: Option[Int] =
      config \ "indexer" \ "history_retain" match {
        case JInt(n) => Some(n.toInt)
        case JDouble(d) => Some(d.toInt)
        case _ => None
      }

    /** the selected network block — networks.<configNetwork>; every
      * network-scoped read goes through here and fails loudly on a typo'd
      * network name (the reference raises KeyError at first use). */
    def network: JValue = config \ "networks" \ configNetwork match {
      case JNothing => throw new IllegalArgumentException(
        s"settings: networks.$configNetwork not present")
      case v => v
    }

    /** networks.<net>.app_mode (tasks.py:43). */
    def appMode: String = str(network \ "app_mode", s"networks.$configNetwork.app_mode")

    /** networks.<net>.addresses.<contract> (tasks.py:96,176-179); optional
      * contracts (BProToken) return None like the reference's `in` check. */
    def address(contract: String): Option[String] =
      network \ "addresses" \ contract match {
        case JString(s) => Some(s)
        case _ => None
      }
  }

  /** resolve from explicit inputs — the pure core. */
  def resolve(env: Map[String, String], settingsJson: Option[String],
      connectionNetwork: Option[String] = None,
      configNetwork: Option[String] = None): Resolved = {
    val baseText = env.get("APP_CONFIG").orElse(settingsJson).getOrElse(
      throw new IllegalArgumentException(
        "select a settings document or set APP_CONFIG " +
          "(config_parser.py:56: 'Please select path to config or env APP_CONFIG')"))
    val conn = env.get("APP_CONNECTION_NETWORK").orElse(connectionNetwork)
      .getOrElse(throw new IllegalArgumentException(
        "select a connection network or set APP_CONNECTION_NETWORK"))
    val net = env.get("APP_CONFIG_NETWORK").orElse(configNetwork)
      .getOrElse(throw new IllegalArgumentException(
        "select a config network or set APP_CONFIG_NETWORK"))
    var config = JsonMethods.parse(baseText)
    env.get("APP_MONGO_URI").foreach(u => config = overrideMongo(config, "uri", u))
    env.get("APP_MONGO_DB").foreach(d => config = overrideMongo(config, "db", d))
    Resolved(config, conn, net)
  }

  /** read a settings file and resolve against the process env — the shape
    * of `ConfigParser(options=path)`. */
  def load(path: String, connectionNetwork: Option[String] = None,
      configNetwork: Option[String] = None): Resolved =
    resolve(sys.env, Some(new String(
        Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)),
      connectionNetwork, configNetwork)

  /** set mongo.<key>; like the reference's `config['mongo'][k] = v`, a
    * settings doc without a `mongo` object fails loudly. */
  private def overrideMongo(config: JValue, key: String, v: String): JValue =
    config \ "mongo" match {
      case JObject(fields) =>
        val mongo = JObject(fields.filterNot(_._1 == key) :+ (key -> JString(v)))
        config match {
          case JObject(top) =>
            JObject(top.map { case ("mongo", _) => ("mongo", mongo); case f => f })
          case other => other
        }
      case other => throw new IllegalArgumentException(
        s"settings: mongo block missing or not an object (got $other) — " +
          "cannot apply APP_MONGO_* override")
    }
}
