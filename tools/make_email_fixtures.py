#!/usr/bin/env python3
"""Email/mbox fixtures for EmailSpec, written by python's INDEPENDENT
stdlib email package (generator + MIME classes), so the Scala parser
is pinned against a second implementation of RFC 5322/2045/2047.
Run from the repo root."""
import mailbox
import os
from email.message import EmailMessage
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText
from email.mime.application import MIMEApplication
from email.header import Header

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "email")
os.makedirs(OUT, exist_ok=True)


def write(name, data: bytes):
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(data)
    print("%-18s %6d bytes" % (name, len(data)))


# simple: 8bit plain text, folded header
m = EmailMessage()
m["From"] = "Alice Example <alice@example.org>"
m["To"] = "bob@example.net"
m["Subject"] = "Plain hello"
m["Date"] = "Mon, 01 Jan 2024 10:00:00 +0000"
m["Message-ID"] = "<simple-1@example.org>"
m.set_content("Just a plain body.\nTwo lines.\n")
write("simple.eml", m.as_bytes())

# multipart/alternative + attachment, QP and base64, encoded-word subject
outer = MIMEMultipart("mixed")
outer["From"] = "sender@example.org"
outer["To"] = "rcpt@example.org"
outer["Subject"] = Header("Héllo — múltipart", "utf-8").encode()
outer["Date"] = "Tue, 02 Jan 2024 11:30:00 +0000"
alt = MIMEMultipart("alternative")
plain = MIMEText("Thé plain text pärt.\n", "plain", "utf-8")  # -> base64 or qp
html = MIMEText("<html><body><p>The <b>html</b> part.</p></body></html>",
                "html", "iso-8859-1")
alt.attach(plain)
alt.attach(html)
outer.attach(alt)
att = MIMEApplication(bytes(range(64)), "octet-stream")
att.add_header("Content-Disposition", "attachment", filename="blob.bin")
outer.attach(att)
write("multipart.eml", outer.as_bytes())

# quoted-printable body with soft line breaks + Q-encoded header
m = EmailMessage()
m["From"] = "=?iso-8859-1?Q?Andr=E9?= <andre@example.org>"
m["To"] = "x@example.org"
m["Subject"] = "=?utf-8?Q?caf=C3=A9_report?="
m["Date"] = "Wed, 03 Jan 2024 12:00:00 +0000"
m.set_content("A long line that the quoted-printable encoder will wrap "
              "with soft breaks, plus déjà-vu accents to force QP. " * 3,
              cte="quoted-printable")
write("qp.eml", m.as_bytes())

# mbox with three messages (one containing a ">From " quoted body line)
mb_path = os.path.join(OUT, "archive.mbox")
if os.path.exists(mb_path):
    os.remove(mb_path)
mb = mailbox.mbox(mb_path)
for i, body in enumerate([
        "first message body\n",
        "second message\nFrom the middle of a line is fine\n",
        "third body\n>already quoted\n"]):
    mm = EmailMessage()
    mm["From"] = f"m{i}@example.org"
    mm["To"] = "list@example.org"
    mm["Subject"] = f"Message {i}"
    mm["Date"] = f"Thu, 0{i + 4} Jan 2024 09:00:00 +0000"
    mm.set_content(body)
    mb.add(mm)
mb.flush()
mb.close()
print("archive.mbox     %6d bytes" % os.path.getsize(mb_path))

print("fixtures ->", os.path.abspath(OUT))
