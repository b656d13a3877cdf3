// standalone PLP fixture dumper: raw lin16 -> PLP features (text)
#include <stdio.h>
#include <stdlib.h>
#include "plp.h"
int main(int argc, char **argv) {
    if (argc < 3) { fprintf(stderr, "usage: plpdump in.raw out.txt [sample_freq vs step nbanks lo hi order compress lifter scale addc0]\n"); return 1; }
    FILE *f = fopen(argv[1], "rb");
    fseek(f, 0, SEEK_END); long n = ftell(f) / 2; fseek(f, 0, SEEK_SET);
    short *buf = new short[n]; fread(buf, 2, n, f); fclose(f);
    float *wave = new float[n];
    for (long i = 0; i < n; i++) wave[i] = (float)buf[i];

    PLPCoefs plp;
    int fs = argc>3?atoi(argv[3]):8000, vs = argc>4?atoi(argv[4]):200, st = argc>5?atoi(argv[5]):80;
    int nb = argc>6?atoi(argv[6]):15; float lo = argc>7?atof(argv[7]):64, hi = argc>8?atof(argv[8]):4000;
    int order = argc>9?atoi(argv[9]):12;
    plp.SetSampleFreq(fs); plp.SetVectorSize(vs); plp.SetStep(st);
    plp.SetBanksNum(nb); plp.SetBanksFullNum(-1);
    plp.SetLowFreq(lo); plp.SetHighFreq(hi); plp.SetPreemCoef(0.0f); plp.SetZMeanSource(false);
    plp.SetLPCOrder(order); plp.SetCompressFactor(argc>10?atof(argv[10]):0.3333333f);
    plp.SetCepstralLifter(argc>11?atof(argv[11]):22.0f); plp.SetCepstralScale(argc>12?atof(argv[12]):10.0f);
    plp.SetAddC0(argc>13?atoi(argv[13]):1);

    plp.AddWaveform(wave, n);
    int np = plp.GetNParams();
    float *frame = new float[np];
    FILE *out = fopen(argv[2], "w");
    while (plp.GetFeatures(frame)) {
        for (int i = 0; i < np; i++) fprintf(out, " %e", frame[i]);
        fprintf(out, "\n");
    }
    fclose(out);
    return 0;
}
