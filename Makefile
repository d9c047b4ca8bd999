.PHONY: test test-fast native bench smoke multichip clean

test:            ## full suite on the 8-device virtual CPU mesh (~20 min)
	python -m pytest tests/ -q

test-fast:       ## everything except @slow and the heavy train tests
	python -m pytest tests/ -q -m "not slow" --ignore=tests/test_train.py \
	    --ignore=tests/test_integration.py

native:          ## build the C++ batch record decoder
	$(MAKE) -C emotiongestures_tpu/native

bench:           ## one-JSON-line throughput benchmark (real chip)
	python bench.py

smoke:           ## fast end-to-end CLI smoke on synthetic data
	python -m emotiongestures_tpu.cli.test_emotion_gesture_diversity_iterative \
	    --synthetic 64 --test_batch_size 32 --skip_beat
	python -m emotiongestures_tpu.cli.train_auxiliary --model fgd \
	    --synthetic 32 --batch_size 8 --total_epoch 1 \
	    --model_save_path /tmp/egtp_smoke

multichip:       ## entry + 8-device mesh dry run on virtual CPU devices
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python __graft_entry__.py

clean:
	$(MAKE) -C emotiongestures_tpu/native clean
	rm -rf .pytest_cache
