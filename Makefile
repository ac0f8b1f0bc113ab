# Developer commands (the role of the reference's justfile:1-41).

SCENE ?= /tmp/rt_scenes/demo.gltf
OUT ?= out.png
WIDTH ?= 512
HEIGHT ?= 512

.PHONY: scenes run debug bench brrr test test-fast native golden oracle clean

scenes:  ## generate the five benchmark scenes
	python -c "from raytracer_odin_tpu.models import assets; \
	  [assets.generate(n, '/tmp/rt_scenes') for n in ['cube','cornell','textured','envmap','demo']]; \
	  print('scenes in /tmp/rt_scenes')"

run: scenes  ## continuous render with preview (justfile `run` equivalent)
	python -m raytracer_odin_tpu.cli $(SCENE) $(OUT) --debug --continious \
	  --width $(WIDTH) --height $(HEIGHT) --ray-depth 8 --num-samples 1024 \
	  --preview-port 8000 --preview-file preview.png

debug: scenes  ## like run, with NaN tracing (EXPENSIVE_DEBUG analogue)
	python -m raytracer_odin_tpu.cli $(SCENE) $(OUT) --debug --continious \
	  --width $(WIDTH) --height $(HEIGHT) --ray-depth 8 --num-samples 1024 \
	  --preview-port 8000 --debug-nans

brrr: scenes  ## benchmark: 64 trials, no debug features (justfile `brrr`)
	python -m raytracer_odin_tpu.cli $(SCENE) --times 64 \
	  --width $(WIDTH) --height $(HEIGHT)

bench:  ## the driver benchmark (one JSON line)
	python bench.py

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow" -k "not cli and not oracle"

native:
	mkdir -p native/build && g++ -O2 -shared -fPIC -std=c++17 \
	  native/rtnative.cpp -o native/build/librtnative.so

golden:
	python tests/test_golden.py

oracle: scenes  ## reference CPU render of the cube scene
	python -m raytracer_odin_tpu.cli /tmp/rt_scenes/cube.gltf oracle.png \
	  --oracle --width 128 --height 128 --ray-depth 3 --num-samples 32

clean:
	rm -rf native/build .jax_cache .pytest_cache
	find . -name __pycache__ -type d | xargs rm -rf
