"""Round-end bench ritual enforcement: verify the committed .xla_cache is
warm for the CURRENT bench programs.

The repo's solver-bench strategy rests on "warm the committed cache after
the last program-touching change" (bench.py module docstring) — but round 4
broke that protocol silently: the final two commits changed the loop
program, the cache was never re-warmed, and the driver's bench paid a cold
compile straight into its timeout (BENCH_r04.json rc=124, zero numbers).
This script is the missing enforcement (judge r4 next-round item 1c):

    python scripts/check_bench_ready.py            # full bench run + check
    python scripts/check_bench_ready.py --derivative-only   # skip solver

It runs `python bench.py` exactly as the driver does, then fails loudly if
  * any NEW file appeared under .xla_cache (program hash changed since the
    last warm-up: the committed cache is stale for at least one program), or
  * the bench emitted no nonzero metric line.
On failure it lists the new cache entries; commit them (after pruning
stale same-program predecessors) or re-warm and re-run. Exit 0 = the
driver's round-end run will hit a warm cache.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".xla_cache")


def _git_cache_status():
    out = subprocess.run(
        ["git", "status", "--porcelain", "--", ".xla_cache"],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout
    return [ln for ln in out.splitlines() if ln.strip()]


def main():
    env = dict(os.environ)
    if "--derivative-only" in sys.argv:
        env["BENCH_SOLVER"] = "0"
    before = set(os.listdir(CACHE)) if os.path.isdir(CACHE) else set()

    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        cwd=ROOT, env=env, capture_output=True, text=True,
    )
    sys.stdout.write(p.stdout)
    sys.stderr.write(p.stderr[-2000:] if p.stderr else "")

    after = set(os.listdir(CACHE)) if os.path.isdir(CACHE) else set()
    # Tiny eager-op entries (reshape/broadcast/reduce scalars from host-side
    # glue) trickle in nondeterministically across runs and compile in
    # <1s — they are not the hazard. The ritual guards against UNCACHED
    # PROGRAM compiles (run_k, the device-IPM loop, KKT solves), which are
    # multi-minute through the remote tunnel and always megabytes.
    BIG = 256 * 1024
    new_all = sorted(after - before)
    small = [f for f in new_all
             if os.path.getsize(os.path.join(CACHE, f)) < BIG]
    new = [f for f in new_all if f not in small]
    if small:
        print(f"(info: {len(small)} small (<256KB) new cache entries — "
              "eager-op glue, not program compiles; commit at leisure)",
              file=sys.stderr)
    dirty = []
    for ln in _git_cache_status():
        path = ln.split(None, 1)[1] if len(ln.split(None, 1)) > 1 else ""
        full = os.path.join(ROOT, path)
        if ln.startswith("??") and os.path.isfile(full) \
                and os.path.getsize(full) < BIG:
            continue  # same small-entry tolerance as above
        dirty.append(ln)

    nonzero = False
    for line in p.stdout.splitlines():
        if line.startswith("{") and '"metric"' in line:
            try:
                if json.loads(line).get("value", 0) > 0:
                    nonzero = True
            except ValueError:
                pass

    ok = True
    if new:
        ok = False
        print(
            f"\nSTALE CACHE: {len(new)} new .xla_cache entries appeared "
            "during the bench run — a program changed since the last "
            "warm-up. Prune stale predecessors, `git add .xla_cache`, "
            "commit, and re-run this check:",
            file=sys.stderr,
        )
        for f in new[:20]:
            print(f"  + {f}", file=sys.stderr)
    elif dirty:
        ok = False
        print(
            "\nUNCOMMITTED CACHE: .xla_cache differs from git HEAD "
            "(entries warmed but never committed — the driver's fresh "
            "checkout would run cold):",
            file=sys.stderr,
        )
        for ln in dirty[:20]:
            print(f"  {ln}", file=sys.stderr)
    if not nonzero:
        ok = False
        print(
            "\nNO NONZERO METRIC: the bench produced no usable number "
            "(see lines above).",
            file=sys.stderr,
        )
    if p.returncode != 0:
        ok = False
        print(f"\nbench.py exited rc={p.returncode}", file=sys.stderr)

    print("BENCH READY" if ok else "BENCH NOT READY", file=sys.stderr)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
