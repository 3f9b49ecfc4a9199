#!/usr/bin/env python3
"""Constellation viewer: scatter-plot recovered symbols.

Equivalent of the reference's demodulator/seeconstelation.py (reads a
complex64 file) extended to also listen on the DiagManager UDP tap
(127.0.0.1:9000, 1024 int8 symbols per datagram — DiagManager.cpp:44-53).

Usage:
  python tools/seeconstellation.py file capture.bin
  python tools/seeconstellation.py udp [port]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax

    jax.config.update("jax_platforms", "cpu")
import socket
import sys

import numpy as np


def from_file(path: str):
    data = np.fromfile(path, dtype=np.complex64)
    return data.real, data.imag


def from_udp(port: int = 9000, datagrams: int = 32):
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", port))
    sock.settimeout(5.0)
    xs, ys = [], []
    try:
        for _ in range(datagrams):
            pkt, _ = sock.recvfrom(4096)
            sym = np.frombuffer(pkt, np.int8).astype(np.float32) / 128.0
            xs.append(sym[0::2])
            ys.append(sym[1::2])
    except socket.timeout:
        pass
    finally:
        sock.close()
    if not xs:
        return np.zeros(0), np.zeros(0)
    return np.concatenate(xs), np.concatenate(ys)


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "udp"
    if mode == "file":
        x, y = from_file(sys.argv[2])
    else:
        port = int(sys.argv[2]) if len(sys.argv) > 2 else 9000
        print(f"listening for constellation datagrams on udp:{port} ...")
        x, y = from_udp(port)
    if len(x) == 0:
        print("no symbols received")
        return 1
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(5, 5))
        plt.plot(x, y, ".", markersize=2, alpha=0.4)
        plt.xlim(-1.5, 1.5)
        plt.ylim(-1.5, 1.5)
        plt.grid(True)
        plt.title(f"constellation ({len(x)} symbols)")
        out = "constellation.png"
        plt.savefig(out, dpi=120)
        print(f"wrote {out}")
    except ImportError:
        # ASCII fallback
        H, W = 21, 41
        grid = [[" "] * W for _ in range(H)]
        for xi, yi in zip(x[:20000], y[:20000]):
            c = int((xi + 1.5) / 3.0 * (W - 1))
            r = int((1.5 - yi) / 3.0 * (H - 1))
            if 0 <= r < H and 0 <= c < W:
                grid[r][c] = "*"
        print("\n".join("".join(row) for row in grid))
    return 0


if __name__ == "__main__":
    sys.exit(main())
