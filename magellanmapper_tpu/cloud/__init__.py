"""Cloud integration: S3/EC2 (boto3-gated) + notifications."""
