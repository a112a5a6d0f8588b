"""SFTP filesystem helpers for the SftpFile connector, over the
from-scratch SSH2/SFTP v3 client in ssh_wire (the environment has no
JSch/paramiko; `cryptography` supplies the primitives).

Reference parity: connector-file-sftp drives a JSch ChannelSftp
through SFTPConnectionProvider (connect, recursive ls, get, put,
mkdirs). Same staging model as ftp_fs: SFTP is a single-server edge
protocol, so files are staged between the remote tree and a local
spool and the battle-tested local format paths do the format work.
"""

from __future__ import annotations

import os
import posixpath
import stat as stat_mod


def _connect(opts: dict):
    from seatunnel_spark.net import apply_host_aliases
    from seatunnel_spark.ssh_wire import connect_sftp

    host = str(opts.get("host") or "")
    port = int(opts.get("port", 22))
    url = apply_host_aliases(f"tcp://{host}:{port}")
    hostpart = url.split("://", 1)[1]
    h, _, p = hostpart.rpartition(":")
    return connect_sftp(
        h, int(p),
        str(opts.get("user") or opts.get("username") or ""),
        str(opts.get("password") or ""))


def _is_dir(attrs: dict) -> bool:
    return stat_mod.S_ISDIR(attrs.get("permissions", 0))


def walk(opts: dict, path: str) -> list[str]:
    """Recursive file listing under `path` (remote paths)."""
    cl = _connect(opts)
    try:
        out: list[str] = []
        base = path.rstrip("/") or "/"
        try:
            if not _is_dir(cl.stat(base)):
                return [base]
        except FileNotFoundError:
            return []
        stack = [base]
        while stack:
            cur = stack.pop()
            for name, attrs in cl.listdir(cur):
                full = posixpath.join(cur, name)
                if _is_dir(attrs):
                    stack.append(full)
                else:
                    out.append(full)
        return sorted(out)
    finally:
        cl.close()


def fetch_tree(opts: dict, path: str, local_dir: str) -> list[str]:
    """Download every file under `path` into local_dir, preserving the
    relative layout. -> local file paths."""
    files = walk(opts, path)
    cl = _connect(opts)
    try:
        locals_: list[str] = []
        base = path.rstrip("/") or "/"
        for remote in files:
            rel = remote[len(base):].lstrip("/") if remote.startswith(base) \
                else posixpath.basename(remote)
            local = os.path.join(local_dir, rel
                                 or posixpath.basename(remote))
            os.makedirs(os.path.dirname(local) or local_dir, exist_ok=True)
            with open(local, "wb") as fh:
                fh.write(cl.read_file(remote))
            locals_.append(local)
        return locals_
    finally:
        cl.close()


def upload_tree(opts: dict, local_dir: str, path: str) -> int:
    """Upload every file under local_dir to `path`, preserving layout.
    -> number of files uploaded."""
    cl = _connect(opts)
    try:
        n = 0
        for root, _dirs, names in os.walk(local_dir):
            for name in names:
                local = os.path.join(root, name)
                rel = os.path.relpath(local, local_dir).replace(os.sep, "/")
                remote = posixpath.join(path.rstrip("/") or "/", rel)
                cl.mkdirs(posixpath.dirname(remote))
                with open(local, "rb") as fh:
                    cl.write_file(remote, fh.read())
                n += 1
        return n
    finally:
        cl.close()


__all__ = ["walk", "fetch_tree", "upload_tree"]
