"""EmailSink — rows as a CSV attachment in one SMTP message.

Reference: connector-email EmailSinkWriter.java:67-160 — every row's
fields comma-joined into an `emailsink.csv` attachment, one MIME
message at close with the configured subject/body, sent via
mail.host/mail.smtp.port (smtp_auth adds SSL + password auth).
Notification-style sink: rows funnel to the driver, hard-capped like
the other notification sinks — a 100 TB frame is not an email.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from seatunnel_spark.sinks.base import Sink

_MAX_ROWS = 100_000


class EmailSink(Sink):
    NAME = "EmailSink"

    def write(self, df: DataFrame) -> None:
        import smtplib
        from email.mime.base import MIMEBase
        from email.mime.multipart import MIMEMultipart
        from email.mime.text import MIMEText

        from seatunnel_spark.net import apply_host_aliases

        rows = df.limit(_MAX_ROWS + 1).collect()
        if len(rows) > _MAX_ROWS:
            raise ValueError(
                f"EmailSink: more than {_MAX_ROWS} rows — an email "
                "attachment is a notification, not a data export")
        csv = "".join(
            ",".join("" if v is None else str(v) for v in r) + "\n"
            for r in rows)

        msg = MIMEMultipart()
        msg["From"] = str(self.require("email_from_address"))
        to = str(self.require("email_to_address"))
        msg["To"] = to
        msg["Subject"] = str(self.opt("email_message_headline", ""))
        msg.attach(MIMEText(str(self.opt("email_message_content", "")),
                            "plain"))
        part = MIMEBase("text", "csv")
        part.set_payload(csv.encode())
        part.add_header("Content-Disposition",
                        'attachment; filename="emailsink.csv"')
        msg.attach(part)

        host = str(self.require("email_host"))
        port = int(self.opt("email_smtp_port", 25))
        url = apply_host_aliases(f"tcp://{host}:{port}")
        hostpart = url.split("://", 1)[1]
        h, _, p = hostpart.rpartition(":")
        auth = str(self.opt("email_smtp_auth", "false")).lower() == "true"
        if auth:
            import ssl

            # the reference's MailSSLSocketFactory.setTrustAllHosts(true)
            # + mail.smtp.ssl.enable=true (EmailSinkWriter.java:88-93):
            # SSL transport with certificate verification disabled
            cl = smtplib.SMTP_SSL(
                h, int(p), timeout=30,
                context=ssl._create_unverified_context())  # noqa: S323
            cl.login(msg["From"],
                     str(self.opt("email_authorization_code", "")))
        else:
            cl = smtplib.SMTP(h, int(p), timeout=30)
        try:
            cl.sendmail(msg["From"],
                        [a.strip() for a in to.split(",")],
                        msg.as_string())
        finally:
            cl.quit()
