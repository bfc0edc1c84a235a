% Hand-authored 3-bus test case (MATPOWER format) for parser testing.
function mpc = case3
mpc.version = '2';
mpc.baseMVA = 100;

%% bus data
%	bus_i	type	Pd	Qd	Gs	Bs	area	Vm	Va	baseKV	zone	Vmax	Vmin
mpc.bus = [
	1	3	0	0	0	0	1	1	0	230	1	1.1	0.9;
	2	1	50	20	0	0	1	1	0	230	1	1.1	0.9;
	3	1	60	25	0	5	1	1	0	230	1	1.1	0.9;
];

%% generator data
%	bus	Pg	Qg	Qmax	Qmin	Vg	mBase	status	Pmax	Pmin
mpc.gen = [
	1	0	0	100	-100	1	100	1	200	0;
	2	0	0	80	-80	1	100	1	150	0;
	3	0	0	0	0	1	100	0	100	0;
];

%% branch data
%	fbus	tbus	r	x	b	rateA	rateB	rateC	ratio	angle	status	angmin	angmax
mpc.branch = [
	1	2	0.01	0.06	0.02	250	0	0	0	0	1	-30	30;
	2	3	0.02	0.08	0.01	150	0	0	0	0	1	-30	30;
	1	3	0.015	0.07	0.015	0	0	0	0.98	2.0	1	-30	30;
	1	2	0.05	0.2	0	100	0	0	0	0	0	-30	30;
];

%% generator cost data
%	model	startup	shutdown	n	c2	c1	c0
mpc.gencost = [
	2	0	0	3	0.01	30	100;
	2	0	0	3	0.02	25	50;
	2	0	0	3	0.0	40	0;
];
