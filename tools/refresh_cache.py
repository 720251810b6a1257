"""Refresh the committed persistent compile cache (``.jax_cache_tpu``).

The driver runs ``python bench.py`` unattended with a tight timeout, so
the benchmark programs must hit the committed cache (cold compiles take
40-240 s each on the shared relay).  Cache keys are stable across
source-line shifts since ``bench.py`` sets
``jax_traceback_in_locations_limit=0`` (without it, Pallas/Mosaic
payloads embed call-stack source locations and ANY line shift on the
trace path re-keys the program), but real changes to the math, shapes,
or static options still re-key -- run this after such changes:

    python tools/refresh_cache.py           # refresh + git stage
    python tools/refresh_cache.py --check   # exit 1 if bench would miss

Protocol:
1. delete cache entries not tracked by git (experiment debris),
2. run ``bench.py`` and ``bench.py all`` once each (cold compiles
   write any missing entries),
3. run ``bench.py`` again and assert ``cache_warm`` is true,
4. ``git add`` new entries; ``git rm`` tracked entries that no program
   touched in step 2/3 (stale keys from older sources).
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
CACHE = os.path.join(REPO, ".jax_cache_tpu")


def _git(*args, **kw):
    return subprocess.run(["git", "-C", REPO] + list(args),
                          capture_output=True, text=True, **kw)


def _tracked():
    # entries committed at HEAD -- NOT ``ls-files``, which also lists
    # freshly staged additions and would make pruning eat the entries
    # this very refresh just produced
    out = _git("ls-tree", "-r", "--name-only", "HEAD",
               ".jax_cache_tpu").stdout.split()
    return {os.path.basename(p) for p in out}


def _entries():
    try:
        return set(os.listdir(CACHE))
    except OSError:
        return set()


def _run_bench(*args):
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "bench.py"), *args],
                       capture_output=True, text=True, cwd=REPO,
                       timeout=3600)
    lines = [ln for ln in r.stdout.splitlines()
             if ln.startswith("{")]
    return r.returncode, (json.loads(lines[-1]) if lines else {})


def main(argv):
    check = "--check" in argv
    tracked = _tracked()

    if check:
        rc, out = _run_bench()
        warm = out.get("cache_warm")
        print(json.dumps({"rc": rc, "cache_warm": warm}))
        return 0 if (rc == 0 and warm) else 1

    # 1. drop untracked debris so access tracking below is clean
    removed = 0
    for e in _entries() - tracked:
        os.unlink(os.path.join(CACHE, e))
        removed += 1
    print(f"removed {removed} untracked entries")

    # 2. populate
    before = _entries()
    for args in ((), ("all",)):
        rc, out = _run_bench(*args)
        print(f"bench {' '.join(args) or 'headline'}: rc={rc}")
        if rc != 0:
            print("bench failed; aborting", file=sys.stderr)
            return 1

    # 3. warm assertion
    rc, out = _run_bench()
    if not out.get("cache_warm"):
        print("cache still cold after refresh run", file=sys.stderr)
        return 1

    new = _entries() - before
    # atime-based access tracking is unreliable (relatime), so keep
    # every entry that is pre-tracked and still present or newly
    # written; prune superseded tracked entries only when --prune is
    # given
    if new:
        _git("add", *sorted(os.path.join(".jax_cache_tpu", e)
                            for e in new))
        print(f"staged {len(new)} new entries")
    if "--prune" in argv:
        live = _entries()
        # tracked entries never re-written this refresh AND older than
        # the refresh start are candidates; conservative: only remove
        # entries for program names that now have a NEWER sibling
        names = {}
        for e in live:
            name = e.split("-")[0]
            names.setdefault(name, []).append(e)
        pruned = []
        for name, es in names.items():
            fresh = [e for e in es if e in new]
            if fresh:
                for e in es:
                    if e in tracked and e not in new:
                        pruned.append(e)
        if pruned:
            _git("rm", "-q", "--cached",
                 *[os.path.join(".jax_cache_tpu", e) for e in pruned])
            for e in pruned:
                os.unlink(os.path.join(CACHE, e))
            print(f"pruned {len(pruned)} superseded entries")
    print("done; commit the staged cache changes")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
