# Build / test entry points (capability of the reference Makefile:1-20).
# The native oracle also auto-builds on first import; this just makes the
# artifacts explicit.

NATIVE_DIR := seqalign_tpu/native
NATIVE_SO  := $(NATIVE_DIR)/libseqalign_oracle.so

.PHONY: all test bench clean

all: $(NATIVE_SO)

$(NATIVE_SO): $(NATIVE_DIR)/oracle.cpp
	g++ -O3 -march=native -std=c++17 -shared -fPIC -o $@ $<

test: $(NATIVE_SO)
	python -m pytest tests/ -q

bench: $(NATIVE_SO)
	python bench.py

clean:
	rm -f $(NATIVE_SO)
	find . -name __pycache__ -type d -exec rm -rf {} +
