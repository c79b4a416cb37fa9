import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def read_fixture(*parts: str) -> str:
    # newline='' keeps CRLF exactly as the reference's byte-compare does
    with open(os.path.join(FIXTURE_DIR, *parts), encoding="utf-8", newline="") as f:
        return f.read()
