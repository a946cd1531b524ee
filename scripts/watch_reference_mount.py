#!/usr/bin/env python
"""Reference-mount watch (VERDICT r4 next #8a).

`/root/reference/` has been EMPTY for the project's whole life (0 files,
verified every round); every `(recon)` citation and SURVEY §2/§3 claim was
reconstructed from memory of the public NVlabs/STEP repo. The moment the
mount populates, that reconstruction must be re-verified — this script is
the day-one gate:

    python scripts/watch_reference_mount.py            # report + checklist
    python scripts/watch_reference_mount.py --quiet    # exit code only

Exit codes: 0 = still empty (nothing to do), 1 = POPULATED — run the
printed re-verification checklist before trusting any (recon) claim.
"""

import argparse
import os
import sys

REFERENCE = "/root/reference"

CHECKLIST = """\
REFERENCE MOUNT POPULATED — SURVEY §0 re-verification is now task #0:

 1. Inventory: `find {ref} -type f | sort` — compare the top-level layout
    against SURVEY.md §2's component table (train.py/test.py/models/
    external ROI-NMS extension/data loaders/tube utils expected).
 2. Re-verify SURVEY §2/§3 row by row against the real code; update every
    docstring citation from `path (recon)` to `path:line`, and fix any
    claim the real code contradicts (matching rule, loss shapes, LR
    schedule, proposal jitter, NMS ordering are the highest-risk rows).
 3. Run the frame-mAP acceptance harness (BASELINE.json: within 0.1 of
    the reference on UCF101-24): train/eval the reference with its own
    scripts if runnable, else load its released detector checkpoint
    through models/convert.py and compare test.py outputs on the same
    frames.
 4. Check PARITY.md's open questions; close each with a file:line answer.
 5. Re-run the copy-paste self-audit: the builder has never seen this
    code, but similar-shape files must be re-justified now that a real
    diff target exists.
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    files = []
    for base, _dirs, names in os.walk(REFERENCE):
        files.extend(os.path.join(base, n) for n in names)
    if not files:
        if not args.quiet:
            print(f"{REFERENCE}: still empty (0 files) — recon-based "
                  "SURVEY remains the operative blueprint")
        return 0
    if not args.quiet:
        total = sum(os.path.getsize(f) for f in files)
        print(f"{REFERENCE}: {len(files)} files, {total / 1e6:.1f} MB")
        by_ext = {}
        for f in files:
            by_ext[os.path.splitext(f)[1] or "<none>"] = (
                by_ext.get(os.path.splitext(f)[1] or "<none>", 0) + 1)
        for ext, n in sorted(by_ext.items(), key=lambda kv: -kv[1]):
            print(f"  {ext}: {n}")
        print()
        print(CHECKLIST.format(ref=REFERENCE))
    return 1


if __name__ == "__main__":
    sys.exit(main())
