#!/usr/bin/env python
"""Stopwatch telemetry listener — the external timing viewer's role.

The reference streams {type,name,value} triples over UDP to
127.0.0.1:45454 for an external Stopwatch viewer (Stopwatch.h:97-110);
kintinuous_tpu sends the same registry as JSON datagrams
(runtime/stopwatch.py). This tool renders them as a live terminal
table, one row per named span, with per-process signatures.

Usage: python tools/stopwatch_listen.py [port]
"""

import json
import socket
import sys
import time


def main():
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 45454
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", port))
    sock.settimeout(0.5)
    latest = {}  # sig -> (recv_time, timings)
    print(f"listening on udp://127.0.0.1:{port} (ctrl-c to quit)")
    last_draw = 0.0
    while True:
        try:
            data, _ = sock.recvfrom(65536)
            msg = json.loads(data)
            latest[msg.get("sig", "?")] = (time.monotonic(), msg["timings"])
        except socket.timeout:
            pass
        except (ValueError, KeyError):
            continue
        now = time.monotonic()
        if now - last_draw < 0.5:
            continue
        last_draw = now
        lines = ["\x1b[2J\x1b[H" + f"{'span':32s} {'ms':>10s}   source"]
        for sig, (t, timings) in sorted(latest.items()):
            age = now - t
            stale = " (stale)" if age > 5 else ""
            for name, ms in sorted(timings.items()):
                if name.startswith("pulse."):
                    lines.append(f"{name[6:]:32s} {'alive':>10s}   {sig}{stale}")
                else:
                    lines.append(f"{name:32s} {ms:10.2f}   {sig}{stale}")
        print("\n".join(lines), flush=True)


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        pass
