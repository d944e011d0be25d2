"""Package an e2e system-proof summary into a round artifact json.

Copies the run summary, prepends a free-text note, and prints the result:

    python tools/package_artifact.py --summary /tmp/e2e_hard/ap_summary.json \
        --out AP_r03.json --note "..."
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--summary", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    summary = json.load(open(args.summary))
    if args.note:
        summary["note"] = args.note
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "note"},
                     indent=1)[:2000])


if __name__ == "__main__":
    main()
