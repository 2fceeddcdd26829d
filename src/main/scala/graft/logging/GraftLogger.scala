package graft.logging

import java.io.PrintStream
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import graft.config.GraftConfig

/** Structured logging subsystem (reference `logger/logger.go:18-131`):
  * a JSON handler and a colored console handler behind one interface,
  * with the level threshold and format chosen by config — so the
  * `log.format` / `log.level` keys actually change service output.
  *
  *  - `format=json` → one JSON object per line (`{"time":…,"level":…,
  *    "msg":…,attrs…}`), mirroring `slog.NewJSONHandler` (`logger.go:22-26`).
  *  - anything else → `"yyyy-MM-dd HH:mm:ss | LEVEL | msg key=value"`,
  *    with the ANSI-colored level of the custom console handler
  *    (`logger.go:70-86`, `colorizeLevel :119-131`).
  *  - levels parse like `parseLogLevel` (`logger.go:104-117`): debug /
  *    info / warn / error, unknown → info; records below the threshold
  *    are dropped.
  *
  * The output stream is injectable for tests; the default is stdout like
  * the reference (`logger.go:20`).
  */
final class GraftLogger(format: String, level: String,
    out: PrintStream = System.out) {

  import GraftLogger._

  private val min: Int = rank(level)
  private val json: Boolean = format == "json"

  def isEnabled(lvl: String): Boolean = rank(lvl) >= min

  def debug(msg: String, attrs: (String, Any)*): Unit = log("debug", msg, attrs)
  def info(msg: String, attrs: (String, Any)*): Unit = log("info", msg, attrs)
  def warn(msg: String, attrs: (String, Any)*): Unit = log("warn", msg, attrs)
  def error(msg: String, attrs: (String, Any)*): Unit = log("error", msg, attrs)

  def log(lvl: String, msg: String, attrs: Seq[(String, Any)]): Unit =
    if (isEnabled(lvl)) {
      val time = LocalDateTime.now().format(TimeFmt)
      if (json) {
        // numbers and booleans stay unquoted, like slog's JSON handler
        def jv(v: Any): String = v match {
          case n @ (_: Int | _: Long | _: Short | _: Byte | _: Boolean) =>
            n.toString
          case d: Double if java.lang.Double.isFinite(d) => d.toString
          case f: Float if java.lang.Float.isFinite(f) => f.toString
          case other => q(String.valueOf(other))
        }
        val head = Seq("time" -> q(time), "level" -> q(lvl.toUpperCase),
          "msg" -> q(msg))
        val rest = attrs.map { case (k, v) => k -> jv(v) }
        out.println((head ++ rest).map { case (k, v) => s"${q(k)}:$v" }
          .mkString("{", ",", "}"))
      } else {
        val kv = attrs.map { case (k, v) => s" $k=$v" }.mkString
        out.println(s"$time | ${colorLevel(lvl)} | $msg$kv")
      }
    }

  /** `ConfigBanner` (`logger.go:36-52`): JSON mode logs the config as a
    * structured record; console mode prints the colored banner. */
  def configBanner(cfg: GraftConfig): Unit =
    if (json) {
      info("Configuration Loaded",
        "nats.url" -> cfg.natsUrl, "clickhouse.url" -> cfg.clickhouseUrl,
        "log.format" -> cfg.logFormat, "log.level" -> cfg.logLevel,
        "subjects" -> cfg.subjects.mkString(","))
      info("Service started")
    } else {
      def line(k: String, v: String) = cyan(f"$k%-12s: $v")
      out.println("Starting service ..." +
        s"\n${blue("===== Loaded config ========")}" +
        s"\n${line("NATS_URL", cfg.natsUrl)}" +
        s"\n${line("Ch_URL", cfg.clickhouseUrl)}" +
        s"\n${line("Log format", cfg.logFormat)}" +
        s"\n${line("Log level", cfg.logLevel)}" +
        s"\n${blue("============================")}\n")
    }
}

object GraftLogger {

  private val TimeFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** `parseLogLevel` (`logger.go:104-117`): unknown levels mean info.
    * Case-sensitive ON PURPOSE — the reference's switch matches exact
    * lowercase strings, so `"WARN"` falls to the default (info) there too. */
  private[logging] def rank(level: String): Int = level match {
    case "debug" => 0
    case "warn" => 2
    case "error" => 3
    case _ => 1 // "info" and the reference's default branch
  }

  private def ansi(code: Int, s: String) = "\u001b[" + code + "m" + s + "\u001b[0m"
  private def cyan(s: String) = ansi(36, s)
  private def blue(s: String) = ansi(94, s)

  /** `colorizeLevel` (`logger.go:119-131`). */
  private[logging] def colorLevel(lvl: String): String = lvl match {
    case "error" => ansi(31, "ERROR")
    case "warn" => ansi(33, "WARN")
    case "debug" => ansi(34, "DEBUG")
    case _ => ansi(32, "INFO")
  }

  /** JSON string quoting for the JSON handler's flat records. */
  private def q(s: String): String = graft.util.JsonText.quote(s)

  /** `Init` (`logger.go:18-33`): build the configured logger. */
  def init(cfg: GraftConfig, out: PrintStream = System.out): GraftLogger =
    new GraftLogger(cfg.logFormat, cfg.logLevel, out)
}
