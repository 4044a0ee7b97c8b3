# Round-gate targets (VERDICT r12 #3: the adversarial sweeps are part
# of the end-of-round gate, not ad-hoc tools).  Spark gates are
# serialized — each target runs its own local[N] session; never run
# two in parallel on this machine.

.PHONY: smoke suite selfcheck adversarial gate bench

# ~4 min: contract + functions + engine units + domain model
smoke:
	python -m pytest tests/ -m smoke -q

# ~30 min: the full pytest suite
suite:
	python -m pytest tests/ -x -q

# full-registry oracle snapshot at sf0.01 (SELFCHECK_r{N}.json);
# pass R=13 etc. as `make selfcheck R=13`
R ?= dev
selfcheck:
	python selfcheck.py $(R)

# the four degenerate-corpus sweeps — every registry query through
# BOTH engines on hostile injected parquet; each exits non-zero on
# any divergence.  Serial on purpose (one Spark session at a time).
adversarial:
	python adversarial_check.py
	python adversarial_check_events.py
	python adversarial_check_embeddings.py
	python adversarial_check_tpch.py

# idle-guarded bench (writes the headline JSON line)
bench:
	python bench.py

# the full end-of-round gate, in dependency-light order: cheap suite
# signal first, then the oracle snapshot, then the adversarial sweeps
gate: suite selfcheck adversarial
	@echo "ALL ROUND GATES GREEN"
