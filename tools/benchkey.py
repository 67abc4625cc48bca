#!/usr/bin/env python3
"""Dev-only replica of ToolSupport.benchKey — run BEFORE registering a new
bench wire key.

The benchKeySubs table is a sequential fold: earlier rules rewrite names
before later ones see them ("triangles"->"tri"->"tr" turns retrieval_eval
into retreval_eval; "sky"->"sy" turns skyline into syline). Three round-9
keys were first registered against their raw names and silently missed.
The rule: a late rule's LEFT side must be the FOLDED form — this script
prints it.

Usage:
  python3 tools/benchkey.py                # fold every registered query,
                                           # check collisions + window model
  python3 tools/benchkey.py q_new_name ... # fold specific (new) names

NOT part of the shipped library — driver-side python only.
"""
import re
import sys

SRC = "src/main/scala/graft/ToolSupport.scala"
REG = "src/main/scala/graft/SparkEntry.scala"


def pairs():
    src = open(SRC).read()
    m = re.search(
        r"benchKeySubs: Seq\[\(String, String\)\] = Seq\((.*?)\)\n\n  def benchKey",
        src, re.S)
    return re.findall(r'"([^"]+)"\s*->\s*"([^"]*)"', m.group(1))


def bench_key(name, subs):
    k = name[2:] if name.startswith("q_") else name
    for a, b in subs:
        k = k.replace(a, b)
    return k


def registered():
    names = []
    for n in re.findall(r'"(q_[a-z0-9_]+)"\s+->', open(REG).read()):
        if n not in names:
            names.append(n)
    return names


def main(argv):
    subs = pairs()
    if argv:
        for n in argv:
            print(f"{n} -> {bench_key(n, subs)}")
        return 0
    names = registered()
    keys = [bench_key(n, subs) for n in names]
    dupes = {k for k in keys if keys.count(k) > 1}
    if dupes:
        print("COLLISIONS:", sorted(dupes))
        for n, k in zip(names, keys):
            if k in dupes:
                print(f"  {n} -> {k}")
        return 1
    # 4-char values ("0.42"): the r10 sweep measured 130/176 values in
    # the sub-second 2-dp band — longer than the old "9.9" model, which
    # said 1675 while the real line ran 1772. Budget 1880 = 2000-char
    # driver tail − ~75-char sbt epilogue − safety (ToolSupportSpec twin).
    entries = ",".join(
        f'"{k}":{"-0.42" if i % 10 == 0 else "0.42"}'
        for i, k in enumerate(keys))
    line = ('{"metric":"total","value":9999.9,"unit":"sec","queries":{'
            + entries + '},"sf":"sf0.001"}')
    print(f"{len(keys)} entries, no collisions; "
          f"worst-case model {len(line)}/1880")
    longish = sorted((k for k in keys if len(k) > 2), key=len, reverse=True)
    if longish:
        print("keys over 2 chars:", longish[:10])
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
