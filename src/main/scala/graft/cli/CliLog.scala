package graft.cli

import java.io.{File, FileWriter, PrintWriter}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Reference-parity CLI logging (`csv2parquet.py:212-228`,
  * `add_country.py:220-237`, `agg.py:295-313`): each subcommand logs to a
  * `<prog>.log` FILE handler plus a console handler, with `-d` raising
  * verbosity from INFO to DEBUG — previously the flag was parsed and
  * discarded. Driver-side only; executor/engine logging stays with Spark's
  * log4j.
  *
  * The log directory defaults to the working directory like the reference;
  * the `graft.log.dir` system property / `GRAFT_LOG_DIR` env override it
  * (tests point it at a temp dir).
  */
final class CliLog(prog: String, debugEnabled: Boolean) {
  private val dir = sys.props.getOrElse("graft.log.dir",
    sys.env.getOrElse("GRAFT_LOG_DIR", "."))
  private val file = new File(dir, s"$prog.log")
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  // one persistent auto-flushing handler per logger (like the reference's
  // FileHandler), not an open/close round-trip per line; opened on first
  // write so a silent logger never touches the filesystem
  private var openedWriter: Option[PrintWriter] = None
  private def writer: PrintWriter = openedWriter.getOrElse {
    val w = new PrintWriter(new FileWriter(file, true), true)
    openedWriter = Some(w)
    w
  }

  private def write(level: String, msg: String): Unit = {
    val line = s"${LocalDateTime.now.format(fmt)} $level $prog: $msg"
    Console.err.println(line)
    writer.println(line)
  }

  def info(msg: => String): Unit = write("INFO", msg)
  def debug(msg: => String): Unit = if (debugEnabled) write("DEBUG", msg)
  def error(msg: => String): Unit = write("ERROR", msg)

  /** Release the file handle (the reference's FileHandler has close() too);
    * callers that construct one CliLog per invocation must call this or
    * leak one fd per run.
    */
  def close(): Unit = { openedWriter.foreach(_.close()); openedWriter = None }
}
