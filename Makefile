# Convenience targets (layout mirrors the reference's Makefile:1-60).
BUILD_DIR ?= native/build
GENERATOR ?= Ninja
BUILD_TYPE ?= RelWithDebInfo

.PHONY: all native configure test bench clean

all: native

configure:
	cmake -S native -B $(BUILD_DIR) -G $(GENERATOR) \
	  -DCMAKE_BUILD_TYPE=$(BUILD_TYPE)

native: configure
	cmake --build $(BUILD_DIR)
	cp $(BUILD_DIR)/libvo_loader.so tpu_vo/io/

test:
	python -m pytest tests/ -x -q

# pytest-xdist across cores; pointless on a 1-core host (this box) but
# cuts the slow full-pipeline compiles on multi-core machines. The
# persistent compile cache (tests/.jax_cache) is shared via the fs.
test-par:
	python -m pytest tests/ -x -q -n auto

bench:
	python bench.py

clean:
	rm -rf $(BUILD_DIR) tpu_vo/io/libvo_loader.so
