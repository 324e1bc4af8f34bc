"""Property-fuzz the ingest-pipeline compiler (VERDICT r4 #7).

`sources/ingest.py` is the operator a real user feeds arbitrary
configs; its per-processor tests pin each processor alone.  Here ≥80
randomly generated processor CHAINS (length 1-6, with `if` guards,
`ignore_missing`, `target_field` redirection, `on_failure` marker
tracking) run through the compiled Catalyst plan AND through an
independent pure-Python row-at-a-time interpreter of the documented
ES semantics — written against the module docstring, not the engine's
column algebra — and every row of every case must agree, failure
marker included.

The generator tracks the evolving (column -> type) environment so
chains are mostly valid by construction; ~15% of processors reference
a missing field with ``ignore_missing: true`` to exercise the skip
path."""

from __future__ import annotations

import random
import re
from datetime import datetime

import pytest

from elasticsearch_nlp_classifier_spark.sources.ingest import (
    compile_ingest_pipeline,
)

N_CASES = 90
MARKER = "_failed"

STR_POOL = ["hello world", "Foo,Bar,baz", " padded ", "abc", "42",
            "3.5", "", None, "x - y", "true", "False", "aa,aa,bb"]
DATE_POOL = ["2026-01-15", "2026/02/28", "notadate", None,
             "15-01-2026", "2026-12-31"]


def _mk_rows(rng, n=60):
    rows = []
    for i in range(n):
        rows.append({
            "doc_id": i,
            "s1": rng.choice(STR_POOL),
            "s2": rng.choice(STR_POOL),
            "n": None if rng.random() < 0.1 else rng.randint(0, 499),
            "d": rng.choice(DATE_POOL),
        })
    return rows


BASE_TYPES = {"doc_id": "int", "s1": "str", "s2": "str", "n": "int",
              "d": "str"}

# ------------------------------------------------- python interpreter
# Direct ES-semantics evaluator over list-of-dict rows.  Deliberately
# row-at-a-time and processor-at-a-time — no Spark, no Columns.


def _cond(row, expr):
    """The tiny `if` grammar the generator emits: 'n > K' | 'n < K' |
    'n % 2 = 0'.  SQL three-valued logic: null -> not-true."""
    if row.get("n") is None:
        return False
    m = re.fullmatch(r"n > (\d+)", expr)
    if m:
        return row["n"] > int(m.group(1))
    m = re.fullmatch(r"n < (\d+)", expr)
    if m:
        return row["n"] < int(m.group(1))
    if expr == "n % 2 = 0":
        return row["n"] % 2 == 0
    raise AssertionError(expr)


def _try_int(v):
    if v is None:
        return None
    s = str(v).strip()
    return int(s) if re.fullmatch(r"[+-]?\d+", s) else None


def _try_double(v):
    if v is None:
        return None
    try:
        return float(str(v).strip())
    except ValueError:
        return None


_BOOL = {"true": True, "t": True, "y": True, "yes": True, "1": True,
         "false": False, "f": False, "n": False, "no": False,
         "0": False}


def _try_bool(v):
    if v is None:
        return None
    return _BOOL.get(str(v).strip().lower())


_FMT = {"yyyy-MM-dd": "%Y-%m-%d", "yyyy/MM/dd": "%Y/%m/%d"}


def _try_ts(v, fmts):
    if v is None:
        return None
    for f in fmts:
        try:
            return datetime.strptime(v, _FMT[f])
        except ValueError:
            pass
    return None


def _interp(rows, cols, processors, marker):
    rows = [dict(r) for r in rows]
    cols = list(cols)
    failed = [False] * len(rows)

    def guard_apply(p, field, compute):
        """new-value-per-row with `if` semantics: rows failing the
        condition keep the old value (null when the field is new)."""
        is_new = field not in cols
        for r in rows:
            old = None if is_new else r.get(field)
            if p.get("if") is not None and not _cond(r, p["if"]):
                r[field] = old
            else:
                r[field] = compute(r)
        if is_new:
            cols.append(field)

    for proc in processors:
        ptype, p = next(iter(proc.items()))
        missing = "field" in p and isinstance(p["field"], str) \
            and p["field"] not in cols
        if ptype == "set" and "copy_from" in p \
                and p["copy_from"] not in cols:
            continue  # ignore_missing skip (generator always sets it)
        if missing and ptype not in ("set", "append", "script", "fail"):
            continue  # ignore_missing skip

        if ptype == "set":
            field = p["field"]
            if "copy_from" in p:
                src = p["copy_from"]
                fn = lambda r, s=src: r.get(s)  # noqa: E731
            else:
                fn = lambda r, v=p["value"]: v  # noqa: E731
            if p.get("override", True) is False and field in cols:
                inner = fn
                fn = lambda r, f=field, i=inner: (  # noqa: E731
                    r.get(f) if r.get(f) is not None else i(r))
            guard_apply(p, field, fn)

        elif ptype == "remove":
            for f in ([p["field"]] if isinstance(p["field"], str)
                      else p["field"]):
                if f in cols:
                    cols.remove(f)
                    for r in rows:
                        r.pop(f, None)

        elif ptype == "rename":
            src, tgt = p["field"], p["target_field"]
            cols[cols.index(src)] = tgt
            for r in rows:
                r[tgt] = r.pop(src)

        elif ptype == "convert":
            field = p["field"]
            target = p.get("target_field", field)
            conv = {"integer": _try_int, "double": _try_double,
                    "boolean": _try_bool, "string":
                        lambda v: None if v is None else str(v)}[
                            p["type"]]
            is_new = target not in cols
            for i, r in enumerate(rows):
                src_v = r.get(field)
                new_v = conv(src_v)
                applies = p.get("if") is None or _cond(r, p["if"])
                failed[i] = failed[i] or (
                    applies and src_v is not None and new_v is None)
                if applies:
                    r[target] = new_v
                else:
                    # documented retyping narrowing: skipped rows carry
                    # the old value through try_cast to the new type
                    r[target] = None if is_new else conv(r.get(target))
            if is_new:
                cols.append(target)

        elif ptype == "gsub":
            field = p["field"]
            target = p.get("target_field", field)
            pat, rep = p["pattern"], p["replacement"]
            guard_apply(p, target, lambda r, f=field: (
                None if r.get(f) is None
                else re.sub(pat, rep, r.get(f))))

        elif ptype in ("lowercase", "uppercase", "trim"):
            field = p["field"]
            target = p.get("target_field", field)
            op = {"lowercase": str.lower, "uppercase": str.upper,
                  "trim": str.strip}[ptype]
            guard_apply(p, target, lambda r, f=field, o=op: (
                None if r.get(f) is None else o(r.get(f))))

        elif ptype == "split":
            field = p["field"]
            target = p.get("target_field", field)
            sep = p["separator"]
            guard_apply(p, target, lambda r, f=field: (
                None if r.get(f) is None else re.split(sep, r.get(f))))

        elif ptype == "join":
            field = p["field"]
            target = p.get("target_field", field)
            sep = p["separator"]
            guard_apply(p, target, lambda r, f=field: (
                None if r.get(f) is None else sep.join(r.get(f))))

        elif ptype == "append":
            field = p["field"]
            vals = p["value"] if isinstance(p["value"], list) \
                else [p["value"]]

            def ap(r, f=field, v=vals, dedup=(
                    p.get("allow_duplicates", True) is False)):
                base = r.get(f) or []
                out = list(base) + list(v)
                if dedup:
                    seen, uniq = set(), []
                    for x in out:
                        if x not in seen:
                            seen.add(x)
                            uniq.append(x)
                    out = uniq
                return out

            guard_apply(p, field, ap)

        elif ptype == "date":
            field = p["field"]
            target = p.get("target_field", "@timestamp")
            fmts = p.get("formats", ["yyyy-MM-dd'T'HH:mm:ss"])
            for i, r in enumerate(rows):
                lost = (r.get(field) is not None
                        and _try_ts(r.get(field), fmts) is None)
                if p.get("if") is not None:
                    lost = lost and _cond(r, p["if"])
                failed[i] = failed[i] or lost
            guard_apply(p, target,
                        lambda r, f=field, fm=fmts: _try_ts(r.get(f), fm))

        elif ptype == "dissect":
            fields = re.findall(r"%\{([^}]+)\}", p["pattern"])
            rx = "^" + "(.*?)".join(
                re.escape(part)
                for part in re.split(r"%\{[^}]+\}", p["pattern"])) + "$"
            src = p["field"]
            for f2i, f2 in enumerate(fields):
                def ext(r, s=src, r_i=f2i):
                    v = r.get(s)
                    if v is None:
                        return None
                    m = re.match(rx, v)
                    return m.group(r_i + 1) if m else ""
                guard_apply(p, f2, ext)

        elif ptype == "script":
            # generator grammar: 'n + K' | 'n * 2'
            m = re.fullmatch(r"n \+ (\d+)", p["source"])
            if m:
                k = int(m.group(1))
                fn = lambda r: None if r.get("n") is None \
                    else r["n"] + k  # noqa: E731
            else:
                assert p["source"] == "n * 2"
                fn = lambda r: None if r.get("n") is None \
                    else r["n"] * 2  # noqa: E731
            guard_apply(p, p["target_field"], fn)

        elif ptype == "fail":
            for i, r in enumerate(rows):
                hit = True if p.get("if") is None else _cond(r, p["if"])
                failed[i] = failed[i] or hit

        else:
            raise AssertionError(ptype)

    for i, r in enumerate(rows):
        r[MARKER] = failed[i]
    return rows, cols + [MARKER]


# ---------------------------------------------------- chain generator

def _gen_if(rng):
    return rng.choice([None, None, f"n > {rng.randint(50, 400)}",
                       f"n < {rng.randint(50, 400)}", "n % 2 = 0"])


def _gen_chain(rng):
    """Random valid chain + evolving type env.  Types: str/int/arr/ts/
    bool/double — string ops only target str cols, join only arr."""
    types = dict(BASE_TYPES)
    chain = []
    fresh = iter(f"f{j}" for j in range(20))

    def cols_of(t):
        return [c for c, ct in types.items() if ct == t]

    for _ in range(rng.randint(1, 6)):
        kinds = ["set", "convert", "gsub", "case", "split", "append",
                 "date", "dissect", "script", "rename", "remove",
                 "fail", "missing"]
        k = rng.choice(kinds)
        p: dict = {}
        if k == "missing":
            # reference a field that does not exist, ignore_missing on
            k2 = rng.choice(["gsub", "convert", "rename", "remove"])
            p = {"field": "nope_" + next(fresh), "ignore_missing": True}
            if k2 == "gsub":
                p.update(pattern="a", replacement="b")
            elif k2 == "convert":
                p.update(type="integer")
            elif k2 == "rename":
                p.update(target_field=next(fresh))
            chain.append({k2: p})
            continue
        if k == "set":
            new = rng.random() < 0.5
            field = next(fresh) if new else rng.choice(cols_of("str"))
            if rng.random() < 0.4 and cols_of("str"):
                src = rng.choice(cols_of("str"))
                p = {"field": field, "copy_from": src,
                     "ignore_missing": True}
                types[field] = types[src]
            else:
                p = {"field": field, "value": rng.choice(
                    ["lit", "other", "42"])}
                types[field] = "str"
            if rng.random() < 0.3:
                p["override"] = False
            ifc = _gen_if(rng)
            if ifc:
                p["if"] = ifc
            chain.append({"set": p})
        elif k == "convert":
            src = rng.choice(cols_of("str") + ["n"])
            t = rng.choice(["integer", "double", "boolean"]) \
                if types[src] == "str" else "string"
            # never retype n in place: the `if` grammar relies on it
            target = next(fresh) if (src == "n" or rng.random() < 0.5) \
                else src
            p = {"field": src, "type": t, "target_field": target}
            ifc = _gen_if(rng)
            if ifc:
                p["if"] = ifc
            types[target] = {"integer": "int", "double": "double",
                             "boolean": "bool", "string": "str"}[t]
            chain.append({"convert": p})
        elif k == "gsub":
            if not cols_of("str"):
                continue
            src = rng.choice(cols_of("str"))
            pat, rep = rng.choice([("[aeiou]", "*"), ("l+", "L"),
                                   (",", "-"), ("[0-9]", "#")])
            p = {"field": src, "pattern": pat, "replacement": rep}
            ifc = _gen_if(rng)
            if ifc:
                p["if"] = ifc
            chain.append({"gsub": p})
        elif k == "case":
            if not cols_of("str"):
                continue
            src = rng.choice(cols_of("str"))
            op = rng.choice(["lowercase", "uppercase", "trim"])
            p = {"field": src}
            ifc = _gen_if(rng)
            if ifc:
                p["if"] = ifc
            chain.append({op: p})
        elif k == "split":
            if not cols_of("str"):
                continue
            src = rng.choice(cols_of("str"))
            target = next(fresh)
            p = {"field": src, "separator": rng.choice([",", " "]),
                 "target_field": target}
            types[target] = "arr"
            chain.append({"split": p})
        elif k == "append":
            arrs = cols_of("arr")
            field = rng.choice(arrs) if arrs and rng.random() < 0.7 \
                else next(fresh)
            p = {"field": field,
                 "value": rng.sample(["aa", "bb", "cc", "dd"],
                                     rng.randint(1, 2))}
            if rng.random() < 0.4:
                p["allow_duplicates"] = False
            ifc = _gen_if(rng)
            if ifc:
                p["if"] = ifc
            types[field] = "arr"
            chain.append({"append": p})
        elif k == "date":
            target = next(fresh)
            p = {"field": "d", "target_field": target,
                 "formats": rng.choice([["yyyy-MM-dd"],
                                        ["yyyy-MM-dd", "yyyy/MM/dd"]])}
            if "d" not in types:
                p["ignore_missing"] = True
            ifc = _gen_if(rng)
            if ifc:
                p["if"] = ifc
            types[target] = "ts"
            chain.append({"date": p})
        elif k == "dissect":
            if not cols_of("str"):
                continue
            src = rng.choice(cols_of("str"))
            a, b = next(fresh), next(fresh)
            p = {"field": src,
                 "pattern": rng.choice([f"%{{{a}}} - %{{{b}}}",
                                        f"%{{{a}}},%{{{b}}}"])}
            types[a] = types[b] = "str"
            chain.append({"dissect": p})
        elif k == "script":
            target = next(fresh)
            p = {"target_field": target,
                 "source": rng.choice(["n + 1", "n + 10", "n * 2"])}
            ifc = _gen_if(rng)
            if ifc:
                p["if"] = ifc
            types[target] = "int"
            chain.append({"script": p})
        elif k == "rename":
            cands = [c for c in types
                     if c not in ("doc_id", "n", "d")]
            if not cands:
                continue
            src = rng.choice(cands)
            tgt = next(fresh)
            types[tgt] = types.pop(src)
            chain.append({"rename": {"field": src,
                                     "target_field": tgt}})
        elif k == "remove":
            cands = [c for c in types
                     if c not in ("doc_id", "n", "d")]
            if not cands:
                continue
            src = rng.choice(cands)
            types.pop(src)
            chain.append({"remove": {"field": src}})
        elif k == "fail":
            p = {}
            ifc = _gen_if(rng)
            if ifc:
                p["if"] = ifc
            p["message"] = "boom"
            chain.append({"fail": p})
    return chain or [{"set": {"field": "f0", "value": "lit"}}]


# ------------------------------------------------------------ harness

def _spark_rows(spark, rows, chain):
    sdf = spark.createDataFrame(
        [(r["doc_id"], r["s1"], r["s2"], r["n"], r["d"]) for r in rows],
        "doc_id bigint, s1 string, s2 string, n bigint, d string")
    out = compile_ingest_pipeline(sdf, chain, failure_marker=MARKER)
    return [r.asDict(recursive=True) for r in out.collect()], out.columns


def _norm(v):
    if isinstance(v, list):
        return tuple(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_fuzz_ingest_chains(spark, seed):
    rng = random.Random(seed)
    rows = _mk_rows(rng)
    cases = N_CASES // 3
    mismatches = []
    for ci in range(cases):
        chain = _gen_chain(rng)
        try:
            got, got_cols = _spark_rows(spark, rows, chain)
        except Exception as exc:  # compile rejection is a mismatch too
            mismatches.append((ci, chain, f"engine raised: {exc!r}"))
            continue
        want, want_cols = _interp(rows, list(BASE_TYPES), chain, MARKER)
        if sorted(got_cols) != sorted(want_cols):
            mismatches.append(
                (ci, chain,
                 f"columns {sorted(got_cols)} != {sorted(want_cols)}"))
            continue
        gm = {r["doc_id"]: r for r in got}
        for w in want:
            g = gm[w["doc_id"]]
            for c in want_cols:
                if _norm(g.get(c)) != _norm(w.get(c)):
                    mismatches.append(
                        (ci, chain,
                         f"doc {w['doc_id']} col {c}: "
                         f"{g.get(c)!r} != {w.get(c)!r}"))
                    break
            else:
                continue
            break
    assert not mismatches, (
        f"{len(mismatches)}/{cases} chains mismatched; first:\n"
        f"{mismatches[0]}")
