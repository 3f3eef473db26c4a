package graft.cdc

/** K4 — the alert-email shape and delivery-mode resolution of the
  * reference's listener error notifications
  * (`app/services/email_notifications.py:38-119`): subject
  * `Listener Error: <name> (ID: <id>)`, a plain-text body carrying client
  * id/name, optional topic, and the error message; SMTP delivery is
  * implicit-SSL on port 465 and STARTTLS on 587/other ports (when TLS is
  * enabled). Alerts are records, not side effects: the manager emits them
  * through its `onAlert` hook and a production deployment maps them onto
  * its mail relay — this container has no SMTP server, and the record
  * carries everything a relay needs.
  */
object EmailAlerts {

  /** SMTP envelope config — the reference's env-var block
    * (`SMTP_HOST/PORT/USER/PASSWORD/USE_TLS/FROM_EMAIL`,
    * `NOTIFICATION_EMAIL`; `email_notifications.py:10-20`).
    */
  case class SmtpConfig(
      host: String,
      port: Int = 465,
      user: String = "",
      password: String = "",
      useTls: Boolean = true,
      fromEmail: String = "",
      notificationEmail: String = "") {
    /** The reference's EMAIL_ENABLED gate: all of host/user/password/
      * recipient must be configured (`email_notifications.py:20`).
      */
    def enabled: Boolean =
      host.nonEmpty && user.nonEmpty && password.nonEmpty && notificationEmail.nonEmpty
    def resolvedFrom: String = if (fromEmail.nonEmpty) fromEmail else user
    /** Port 465 → implicit SSL (never STARTTLS); otherwise STARTTLS when
      * TLS is on (`email_notifications.py:92-112`).
      */
    def mode: String =
      if (port == 465) "ssl" else if (useTls) "starttls" else "plain"
  }

  /** One fully-resolved alert email — the row shape a relay (or an audit
    * table) consumes: smtp_host/smtp_port/mode + addressing + content.
    */
  case class AlertEmail(
      smtp_host: String,
      smtp_port: Int,
      mode: String,
      from_email: String,
      to_email: String,
      subject: String,
      body: String)

  /** Build the listener-error notification for a client — field-for-field
    * the reference's message (`email_notifications.py:63-79`).
    */
  def listenerErrorEmail(cfg: SmtpConfig, clientId: String, clientName: String,
      errorMessage: String, topicName: Option[String] = None): AlertEmail = {
    val subject = s"Listener Error: $clientName (ID: $clientId)"
    val topicLine = topicName.map(t => s"- Topic: $t").getOrElse("")
    val body =
      s"""
         |A listener has stopped due to an error and is no longer receiving events.
         |
         |Client Details:
         |- Client ID: $clientId
         |- Client Name: $clientName
         |$topicLine
         |
         |Error Message:
         |$errorMessage
         |
         |Please check the client configuration and restart the listener once the issue is resolved.
         |
         |This is an automated notification from the Flash Admin system.
         |""".stripMargin
    AlertEmail(cfg.host, cfg.port, cfg.mode, cfg.resolvedFrom,
      cfg.notificationEmail, subject, body)
  }
}
