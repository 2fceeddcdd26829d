package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.config.GraftConfig
import graft.logging.GraftLogger

/** Logger parity with the reference logging subsystem
  * (`logger/logger.go:18-131`): format selection, level threshold,
  * colored console levels, config banner in both modes. */
class GraftLoggerSpec extends AnyFunSuite {

  private def captured(format: String, level: String)(
      f: GraftLogger => Unit): String = {
    val buf = new ByteArrayOutputStream()
    val log = new GraftLogger(format, level, new PrintStream(buf, true, "UTF-8"))
    f(log)
    buf.toString("UTF-8")
  }

  private val cfg = GraftConfig("nats://demo:4222", "ch://u:p@ch:9000",
    "text", "info", Seq("globex.supprt.>"))

  test("json format emits one JSON record per line with attrs") {
    val out = captured("json", "info") { log =>
      log.info("batch sent", "rows" -> 1000, "table" -> "nats_data_all_streams")
    }
    assert(out.trim.startsWith("{") && out.trim.endsWith("}"))
    assert(out.contains("\"level\":\"INFO\""))
    assert(out.contains("\"msg\":\"batch sent\""))
    assert(out.contains("\"rows\":1000")) // numeric attrs unquoted, like slog
    assert(out.linesIterator.size === 1)
  }

  test("console format: time | colored LEVEL | msg key=value") {
    val out = captured("text", "info") { log =>
      log.warn("redelivery", "seq" -> 7)
    }
    assert(out.contains(" | "))
    assert(out.contains("[33mWARN[0m")) // yellow (logger.go:123-124)
    assert(out.contains("redelivery seq=7"))
  }

  test("level threshold filters below-level records; unknown level means info") {
    val out = captured("text", "warn") { log =>
      log.debug("hidden"); log.info("hidden too"); log.error("shown")
    }
    assert(!out.contains("hidden"))
    assert(out.contains("[31mERROR[0m")) // red (logger.go:121-122)
    // unknown level string -> info threshold (logger.go:115-116)
    val out2 = captured("text", "nonsense") { log =>
      log.debug("hidden"); log.info("shown")
    }
    assert(!out2.contains("hidden") && out2.contains("shown"))
  }

  test("config banner: colored block in console mode, structured records in json") {
    val console = captured("text", "info")(_.configBanner(cfg))
    assert(console.contains("Starting service ..."))
    assert(console.contains("===== Loaded config ========"))
    assert(console.contains("NATS_URL") && console.contains("nats://demo:4222"))
    val json = captured("json", "info")(_.configBanner(cfg))
    assert(json.contains("\"msg\":\"Configuration Loaded\""))
    assert(json.contains("\"msg\":\"Service started\""))
    assert(json.linesIterator.size === 2)
  }
}
