"""FTP filesystem helpers (stdlib ftplib) for the FtpFile connector.

Reference parity: connector-file-ftp reads/writes through an Apache
commons-net FTPClient in passive mode (connector-file-ftp/.../FtpFileSystemProxy
semantics — connect, recursive list, stream retrieve/store). Here the
same surface over `ftplib.FTP` with host aliases applied, so the
reference's e2e confs (host = "ftp", port 21) run against the mini
server unmodified.

Scale note: FTP is a single-server edge protocol — there is no
distributed FTP read; the reference also funnels every split through
one server. The connector stages files between the FTP tree and a
local spool directory (download before read, upload after write) and
delegates format work to the battle-tested local file paths; a
petabyte lake does not live behind FTP.
"""

from __future__ import annotations

import ftplib
import os
import posixpath


def _connect(opts: dict) -> ftplib.FTP:
    from seatunnel_spark.net import apply_host_aliases

    host = str(opts.get("host") or "")
    port = int(opts.get("port", 21))
    url = apply_host_aliases(f"tcp://{host}:{port}")
    hostpart = url.split("://", 1)[1]
    h, _, p = hostpart.rpartition(":")
    ftp = ftplib.FTP()
    ftp.connect(h, int(p), timeout=30)
    ftp.login(str(opts.get("user") or opts.get("username") or "anonymous"),
              str(opts.get("password") or ""))
    # reference default: passive mode (FtpConnectionMode
    # ACTIVE_LOCAL is opt-in via connection_mode)
    mode = str(opts.get("connection_mode",
                        "passive_local")).lower()
    ftp.set_pasv("active" not in mode)
    return ftp


def walk(opts: dict, path: str) -> list[str]:
    """Recursive file listing under `path` (absolute FTP paths)."""
    ftp = _connect(opts)
    try:
        out: list[str] = []
        stack = [path.rstrip("/") or "/"]
        while stack:
            cur = stack.pop()
            # a path that has a SIZE is a plain file (servers 550 dirs)
            try:
                ftp.size(cur)
                out.append(cur)
                continue
            except ftplib.error_perm:
                pass
            try:
                lines: list[str] = []
                ftp.retrlines(f"LIST {cur}", lines.append)
            except ftplib.error_perm:
                continue
            for ln in lines:
                parts = ln.split(None, 8)
                if len(parts) < 9:
                    continue
                name, is_dir = parts[8], ln.startswith("d")
                full = posixpath.join(cur, name)
                if is_dir:
                    stack.append(full)
                else:
                    out.append(full)
        return sorted(out)
    finally:
        ftp.quit()


def fetch_tree(opts: dict, path: str, local_dir: str) -> list[str]:
    """Download every file under `path` into local_dir, preserving the
    relative layout. -> local file paths."""
    files = walk(opts, path)
    ftp = _connect(opts)
    try:
        locals_: list[str] = []
        base = path.rstrip("/") or "/"
        for remote in files:
            rel = remote[len(base):].lstrip("/") if remote.startswith(base) \
                else posixpath.basename(remote)
            local = os.path.join(local_dir, rel or
                                 posixpath.basename(remote))
            os.makedirs(os.path.dirname(local) or local_dir, exist_ok=True)
            with open(local, "wb") as fh:
                ftp.retrbinary(f"RETR {remote}", fh.write)
            locals_.append(local)
        return locals_
    finally:
        ftp.quit()


def _mkdirs(ftp: ftplib.FTP, path: str) -> None:
    cur = ""
    for seg in path.strip("/").split("/"):
        cur = f"{cur}/{seg}"
        try:
            ftp.mkd(cur)
        except ftplib.error_perm:
            pass  # exists


def upload_tree(opts: dict, local_dir: str, path: str) -> int:
    """Upload every file under local_dir to `path`, preserving layout.
    -> number of files uploaded."""
    ftp = _connect(opts)
    try:
        n = 0
        for root, _dirs, names in os.walk(local_dir):
            for name in names:
                local = os.path.join(root, name)
                rel = os.path.relpath(local, local_dir).replace(os.sep, "/")
                remote = posixpath.join(path.rstrip("/") or "/", rel)
                _mkdirs(ftp, posixpath.dirname(remote))
                with open(local, "rb") as fh:
                    ftp.storbinary(f"STOR {remote}", fh)
                n += 1
        return n
    finally:
        ftp.quit()


__all__ = ["walk", "fetch_tree", "upload_tree"]
