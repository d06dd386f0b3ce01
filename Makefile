.PHONY: test oracle bench scaling plans zip

test:
	python -m pytest tests/ -x -q

oracle:
	python tools/check_oracle.py /root/testdata/sf0.01

bench:
	python bench.py

scaling:
	python bench.py --scaling

plans:
	python tools/plan_audit.py > PLANS.md

zip:
	rm -f insar_spark.zip && zip -qr insar_spark.zip insar_spark
