"""Per-core parse_format profile — rows scaled with cores, best-of-N, fresh JVM per run."""
import json, subprocess, sys

RUNNER = r'''
import json, sys
sys.path.insert(0, "/root/repo")
from bench import build_spark, bench_parse_format, _proc_stat_sample, _steal_pct
cpus, rows = sys.argv[1], int(sys.argv[2])
spark = build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
s0 = _proc_stat_sample()
out = bench_parse_format(spark, rows=rows)
out["steal_pct"] = _steal_pct(s0, _proc_stat_sample())
out["cpus"] = cpus
spark.stop()
print("RESULT" + json.dumps(out))
'''

PLAN = [("1", 2_000_000, 3), ("4", 8_000_000, 2), ("8", 16_000_000, 2), ("32", 32_000_000, 2)]
for cpus, rows, reps in PLAN:
    for i in range(reps):
        p = subprocess.run(["python", "-c", RUNNER, cpus, str(rows)],
                           capture_output=True, text=True, cwd="/root/repo")
        for line in p.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line[6:], flush=True)
                break
        else:
            print(json.dumps({"cpus": cpus, "error": p.stderr[-400:]}), flush=True)
