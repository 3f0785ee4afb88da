# Build/run targets for the rust_s2_spark engine.

PYFILES = dist/rust_s2_spark.zip

.PHONY: test check bench package submit clean

test:
	python -m pytest tests/ -x -q

check:
	python tools/check_oracles.py /root/testdata/sf0.01

bench:
	python bench.py

package:
	mkdir -p dist
	rm -f $(PYFILES)
	cd . && zip -qr $(PYFILES) rust_s2_spark -i 'rust_s2_spark/*.py' 'rust_s2_spark/*/*.py'

# Production-shaped launch: spark-submit --py-files (north-rule ship vehicle).
# Local example; on a cluster swap --master for your resource manager.
submit: package
	spark-submit --master 'local[8]' --py-files $(PYFILES) \
	  jobs/spatial_join_job.py --n-docs 50000 --checkpoint-root /tmp/s2_submit_ckpt

clean:
	rm -rf dist /tmp/s2_submit_ckpt
