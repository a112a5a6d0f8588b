"""Mini FTP server (RFC 959 subset) over a local root directory — the
sandbox stand-in for the Testcontainers FTP fixture the reference's
connector-file-ftp-e2e suite runs against (fauria/vsftpd image).

Speaks the commands ftplib (and the FtpFile connector built on it)
uses: USER/PASS auth, TYPE, PWD/CWD/CDUP, PASV + EPSV passive data
connections, LIST/NLST (recursive-enough: per directory), RETR, STOR,
DELE, MKD, RMD, RNFR/RNTO, SIZE, QUIT. Active (PORT) mode is
deliberately absent — the connector always uses passive, like the
reference's FTPClient.enterLocalPassiveMode path.
"""

from __future__ import annotations

import os
import posixpath
import socket
import threading


class MiniFtp:
    def __init__(self, root: str, user: str = "seatunnel",
                 password: str = "pass"):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self.user = user
        self.password = password
        self.host = "127.0.0.1"
        self.commands: list[str] = []

    def _fs_path(self, cwd: str, arg: str) -> str:
        p = arg if arg.startswith("/") else posixpath.join(cwd, arg)
        p = posixpath.normpath(p)
        full = os.path.abspath(os.path.join(self.root, p.lstrip("/")))
        if not full.startswith(self.root):
            raise PermissionError(p)
        return full


def _list_line(full: str, name: str) -> str:
    st = os.stat(full)
    kind = "d" if os.path.isdir(full) else "-"
    return (f"{kind}rw-r--r-- 1 ftp ftp {st.st_size:>12} "
            f"Jan  1 00:00 {name}")


def _handle(conn: socket.socket, srv: MiniFtp) -> None:
    cwd = "/"
    user_ok = False
    authed = False
    data_srv: socket.socket | None = None
    rnfr: str | None = None
    f = conn.makefile("rb")

    def send(line: str) -> None:
        conn.sendall(line.encode() + b"\r\n")

    def open_data() -> socket.socket | None:
        nonlocal data_srv
        if data_srv is None:
            return None
        data_srv.settimeout(10)
        d, _ = data_srv.accept()
        data_srv.close()
        data_srv = None
        return d

    try:
        send("220 mini-ftp ready")
        while True:
            raw = f.readline()
            if not raw:
                return
            line = raw.decode(errors="replace").strip()
            cmd, _, arg = line.partition(" ")
            cmd = cmd.upper()
            srv.commands.append(line)
            if cmd == "USER":
                user_ok = arg == srv.user
                send("331 password required")
            elif cmd == "PASS":
                authed = user_ok and arg == srv.password
                send("230 login ok" if authed else "530 login failed")
            elif not authed:
                send("530 not logged in")
            elif cmd in ("TYPE", "NOOP", "OPTS"):
                send("200 ok")
            elif cmd == "SYST":
                send("215 UNIX Type: L8")
            elif cmd == "PWD":
                send(f'257 "{cwd}"')
            elif cmd == "CWD":
                try:
                    full = srv._fs_path(cwd, arg)
                    if os.path.isdir(full):
                        cwd = "/" + os.path.relpath(
                            full, srv.root).replace(os.sep, "/")
                        cwd = "/" if cwd == "/." else cwd
                        send("250 ok")
                    else:
                        send("550 no such dir")
                except PermissionError:
                    send("550 denied")
            elif cmd == "CDUP":
                cwd = posixpath.dirname(cwd.rstrip("/")) or "/"
                send("250 ok")
            elif cmd in ("PASV", "EPSV"):
                data_srv = socket.socket()
                data_srv.bind((srv.host, 0))
                data_srv.listen(1)
                p = data_srv.getsockname()[1]
                if cmd == "PASV":
                    h = srv.host.replace(".", ",")
                    send(f"227 entering passive mode ({h},{p >> 8},{p & 0xFF})")
                else:
                    send(f"229 entering extended passive mode (|||{p}|)")
            elif cmd in ("LIST", "NLST"):
                d = open_data()
                if d is None:
                    send("425 use PASV first")
                    continue
                send("150 here comes the directory listing")
                target = srv._fs_path(cwd, arg or ".")
                names = sorted(os.listdir(target)) \
                    if os.path.isdir(target) else [os.path.basename(target)]
                base = target if os.path.isdir(target) \
                    else os.path.dirname(target)
                out = []
                for name in names:
                    full = os.path.join(base, name)
                    out.append(name if cmd == "NLST"
                               else _list_line(full, name))
                d.sendall(("\r\n".join(out) + "\r\n").encode()
                          if out else b"")
                d.close()
                send("226 directory send ok")
            elif cmd == "SIZE":
                try:
                    full = srv._fs_path(cwd, arg)
                    if os.path.isdir(full):
                        send("550 not a plain file")
                    else:
                        send(f"213 {os.path.getsize(full)}")
                except OSError:
                    send("550 no such file")
            elif cmd == "RETR":
                d = open_data()
                if d is None:
                    send("425 use PASV first")
                    continue
                try:
                    with open(srv._fs_path(cwd, arg), "rb") as fh:
                        send("150 opening data connection")
                        while chunk := fh.read(65536):
                            d.sendall(chunk)
                    d.close()
                    send("226 transfer complete")
                except OSError:
                    d.close()
                    send("550 no such file")
            elif cmd == "STOR":
                d = open_data()
                if d is None:
                    send("425 use PASV first")
                    continue
                full = srv._fs_path(cwd, arg)
                os.makedirs(os.path.dirname(full), exist_ok=True)
                send("150 ok to send data")
                with open(full, "wb") as fh:
                    while True:
                        chunk = d.recv(65536)
                        if not chunk:
                            break
                        fh.write(chunk)
                d.close()
                send("226 transfer complete")
            elif cmd == "DELE":
                try:
                    os.remove(srv._fs_path(cwd, arg))
                    send("250 deleted")
                except OSError:
                    send("550 no such file")
            elif cmd == "MKD":
                os.makedirs(srv._fs_path(cwd, arg), exist_ok=True)
                send("257 created")
            elif cmd == "RMD":
                try:
                    import shutil

                    shutil.rmtree(srv._fs_path(cwd, arg))
                    send("250 removed")
                except OSError:
                    send("550 cannot remove")
            elif cmd == "RNFR":
                rnfr = srv._fs_path(cwd, arg)
                send("350 ready for RNTO")
            elif cmd == "RNTO":
                if rnfr:
                    full = srv._fs_path(cwd, arg)
                    os.makedirs(os.path.dirname(full), exist_ok=True)
                    os.replace(rnfr, full)
                    rnfr = None
                    send("250 renamed")
                else:
                    send("503 RNFR first")
            elif cmd == "QUIT":
                send("221 bye")
                return
            else:
                send(f"502 {cmd} not implemented")
    except (ConnectionError, OSError):
        pass
    finally:
        try:
            conn.close()
        except OSError:
            pass


def start_mini_ftp(root: str, user: str = "seatunnel",
                   password: str = "pass", port: int = 0):
    srv = MiniFtp(root, user, password)
    sock = socket.create_server((srv.host, port))
    sock.settimeout(0.5)
    stopping = threading.Event()

    def accept_loop():
        while not stopping.is_set():
            try:
                conn, _ = sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=_handle, args=(conn, srv),
                             daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()

    def stop():
        stopping.set()
        try:
            sock.close()
        except OSError:
            pass

    return srv, sock.getsockname()[1], stop


__all__ = ["MiniFtp", "start_mini_ftp"]
