r"""termlog.py — tee-like stdin logger that collapses \r progress lines.

Capability parity with reference `tools/termlog.py:23-68`: reads stdin,
mirrors it raw to stdout, and writes a clean log where carriage-return
updated lines (progress bars) keep only their final state.

Usage: command | python tools/termlog.py OUTPUT_FILE
"""

from __future__ import annotations

import sys


def process_stream(input_stream, output_file, stdout) -> None:
    buffer: list[str] = []
    while True:
        char = input_stream.read(1)
        if not char:
            break
        stdout.write(char)
        stdout.flush()
        if char == "\r":
            buffer = []
        else:
            buffer.append(char)
            if char == "\n":
                output_file.write("".join(buffer))
                output_file.flush()
                buffer = []
    if buffer:
        output_file.write("".join(buffer))
        output_file.flush()


def main() -> None:
    if len(sys.argv) != 2:
        print(f"Usage: {sys.argv[0]} OUTPUT_FILE")
        sys.exit(1)
    try:
        with open(sys.argv[1], "w", encoding="utf-8") as f:
            process_stream(sys.stdin, f, sys.stdout)
    except KeyboardInterrupt:
        print("\nInterrupted by user. Exiting.")
        sys.exit(0)


if __name__ == "__main__":
    main()
