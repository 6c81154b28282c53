package graft.plans

import java.nio.file.{Files, Paths}

/** O9 run reporting — the reference mails an ERB-rendered template with
  * the log buffer attached (taskrabbit/forklift `base/mailer.rb:33-66`,
  * variable binding `:68-79`). This environment has no SMTP egress, so
  * delivery is a pluggable sink: the default writes the rendered report
  * (plus the log attachment) to a file; wiring a real mailer is one
  * [[Reporter.Sink]] implementation. Template binding uses `{{var}}`
  * placeholders (the ERB `<%= var %>` analog). */
object Reporter {

  trait Sink { def deliver(subject: String, body: String, attachment: Option[String]): Unit }

  /** File-sink default: `<dir>/<timestamp>_<subject>.txt` (+ `.log`). */
  class FileSink(dir: String) extends Sink {
    override def deliver(subject: String, body: String, attachment: Option[String]): Unit = {
      Files.createDirectories(Paths.get(dir))
      val safe = subject.replaceAll("[^A-Za-z0-9_-]+", "_")
      val base = s"${System.currentTimeMillis()}_$safe"
      Files.writeString(Paths.get(dir, base + ".txt"), body)
      attachment.foreach(a => Files.writeString(Paths.get(dir, base + ".log"), a))
    }
  }

  /** Render a `{{var}}` template with variable binding (mailer.rb:68-79). */
  def render(template: String, vars: Map[String, Any]): String =
    "\\{\\{\\s*([A-Za-z0-9_]+)\\s*\\}\\}".r.replaceAllIn(template, m =>
      java.util.regex.Matcher.quoteReplacement(
        vars.get(m.group(1)).map(_.toString).getOrElse("")))

  /** Render + deliver, attaching the plan's buffered log lines
    * (`send_template` + logger attachment, mailer.rb:41-55). */
  def send(sink: Sink, subject: String, template: String, vars: Map[String, Any],
           logger: Option[PlanLogger] = None): Unit =
    sink.deliver(subject, render(template, vars),
      logger.map(_.messages.mkString("\n")))
}
