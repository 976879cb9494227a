"""Parse a golden-battery pytest -s log into the MARGINS table."""

import re
import sys


def main(path, out_path):
    rows = []
    pat = re.compile(
        r"(\w+): PSNR ([\d.]+)/([\d.]+) dB, fireflies (\d+)/(\d+)"
        r"(?: \[ref@spp: ([\d.]+) dB, (\d+) ff\])?"
    )
    for line in open(path):
        m = pat.search(line)
        if m:
            name, psnr, floor, ff, budget, refp, refff = m.groups()
            # pytest progress markers (F/E/s) glue onto the name in -q logs
            name = re.sub(r"^[A-EF-Z]+(?=[a-z])", "", name)
            rows.append((name, float(psnr), float(floor), int(ff),
                         int(budget), refp, refff))
    n_pass = sum(1 for r in rows if r[1] >= r[2] and r[3] <= r[4])
    lines = [
        "| test | PSNR | floor | margin | fireflies | budget |",
        "|---|---|---|---|---|---|",
    ]
    for name, psnr, floor, ff, budget, _rp, _rf in rows:
        ok = psnr >= floor and ff <= budget
        tag = "" if ok else " **FAIL**"
        lines.append(
            f"| {name}{tag} | {psnr:.2f} | {floor:.2f} | "
            f"{psnr - floor:+.2f} | {ff} | {budget} |"
        )
    lines.append("")
    lines.append(f"**{n_pass}/{len(rows)} pass**")
    open(out_path, "w").write("\n".join(lines) + "\n")
    print(f"{n_pass}/{len(rows)} pass -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
